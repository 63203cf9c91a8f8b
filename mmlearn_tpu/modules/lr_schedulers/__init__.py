"""Learning-rate schedules."""

from mmlearn_tpu.modules.lr_schedulers.linear_warmup_cosine_lr import (
    linear_warmup_cosine_annealing_lr,
)
from mmlearn_tpu.modules.lr_schedulers.onecycle import onecycle_lr

__all__ = ["linear_warmup_cosine_annealing_lr", "onecycle_lr"]
