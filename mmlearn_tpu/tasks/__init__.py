"""Training and evaluation tasks."""

from mmlearn_tpu.tasks.base import TrainingTask
from mmlearn_tpu.tasks.contrastive_pretraining import (
    AuxiliaryTaskSpec,
    ContrastivePretraining,
    EvaluationSpec,
    ModuleKeySpec,
)
from mmlearn_tpu.tasks.hooks import EvalRuntime, EvaluationHooks
from mmlearn_tpu.tasks.ijepa import IJEPA

__all__ = [
    "AuxiliaryTaskSpec",
    "ContrastivePretraining",
    "EvalRuntime",
    "EvaluationHooks",
    "EvaluationSpec",
    "IJEPA",
    "ModuleKeySpec",
    "TrainingTask",
]
