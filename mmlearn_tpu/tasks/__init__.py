"""Training and evaluation tasks."""

from mmlearn_tpu.tasks.base import TrainingTask
from mmlearn_tpu.tasks.contrastive_pretraining import (
    AuxiliaryTaskSpec,
    ContrastivePretraining,
    EvaluationSpec,
    ModuleKeySpec,
)
from mmlearn_tpu.tasks.embedding_export import EmbeddingExport
from mmlearn_tpu.tasks.hooks import EvalRuntime, EvaluationHooks
from mmlearn_tpu.tasks.ijepa import IJEPA
from mmlearn_tpu.tasks.zero_shot_classification import (
    ClassificationTaskSpec,
    ZeroShotClassification,
)
from mmlearn_tpu.tasks.zero_shot_retrieval import (
    RetrievalTaskSpec,
    ZeroShotCrossModalRetrieval,
)

__all__ = [
    "ClassificationTaskSpec",
    "RetrievalTaskSpec",
    "ZeroShotClassification",
    "ZeroShotCrossModalRetrieval",
    "AuxiliaryTaskSpec",
    "ContrastivePretraining",
    "EmbeddingExport",
    "EvalRuntime",
    "EvaluationHooks",
    "EvaluationSpec",
    "IJEPA",
    "ModuleKeySpec",
    "TrainingTask",
]
