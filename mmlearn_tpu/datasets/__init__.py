"""Datasets: core abstractions, processors, and built-in dataset wrappers."""

from mmlearn_tpu.datasets.core import (
    CombinedDataset,
    DataLoader,
    DefaultDataCollator,
    Example,
    Modalities,
)
from mmlearn_tpu.datasets.materialize import (
    MaterializedDataset,
    materialize,
)

__all__ = [
    "CombinedDataset",
    "DataLoader",
    "DefaultDataCollator",
    "Example",
    "MaterializedDataset",
    "materialize",
    "Modalities",
]
