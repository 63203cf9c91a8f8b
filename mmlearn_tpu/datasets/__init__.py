"""Datasets: core abstractions, processors, and built-in dataset wrappers."""

from mmlearn_tpu.datasets.core import (
    CombinedDataset,
    DataLoader,
    DefaultDataCollator,
    Example,
    Modalities,
)

__all__ = [
    "CombinedDataset",
    "DataLoader",
    "DefaultDataCollator",
    "Example",
    "Modalities",
]
