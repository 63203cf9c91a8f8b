"""Linear warmup → cosine annealing LR schedule.

Parity: /root/reference/mmlearn/modules/lr_schedulers/linear_warmup_cosine_lr.py
(LinearLR warmup then CosineAnnealingLR via SequentialLR, lines 20-85), as an
optax schedule function.
"""

from __future__ import annotations

import optax

from mmlearn_tpu.conf import store


@store(
    group="modules/lr_schedulers",
    name="linear_warmup_cosine_annealing_lr",
    zen_partial=True,
    populate_full_signature=False,
)
def linear_warmup_cosine_annealing_lr(
    base_lr: float,
    warmup_steps: int,
    max_steps: int,
    start_factor: float = 1.0 / 3.0,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """Build the warmup+cosine schedule.

    ``start_factor`` matches torch ``LinearLR``: warmup begins at
    ``base_lr * start_factor`` and ramps linearly to ``base_lr``.
    """
    warmup = optax.linear_schedule(
        init_value=base_lr * start_factor,
        end_value=base_lr,
        transition_steps=warmup_steps,
    )
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr,
        decay_steps=max(1, max_steps - warmup_steps),
        alpha=eta_min / base_lr if base_lr > 0 else 0.0,
    )
    return optax.join_schedules([warmup, cosine], boundaries=[warmup_steps])
