"""Multi-task project: CLS pooler + rgb/depth transforms.

Parity: /root/reference/projects/multi_task/configs/__init__.py (``CLSPooler``
layer + transforms, reference lines 10-98).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from mmlearn_tpu.conf import external_store
from mmlearn_tpu.datasets.builtin.image_utils import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ImageTransform,
)


@external_store(group="modules/layers", name="CLSPooler",
                populate_full_signature=False)
@dataclass
class CLSPooler:
    """Select the CLS (first) token from a sequence output."""

    cls_index: int = 0

    def __call__(self, x):
        return x[:, self.cls_index]


@external_store(group="datasets/transforms", name="multi_task_rgb_transform",
                populate_full_signature=False)
def multi_task_rgb_transform(size: int = 224, train: bool = True):
    return ImageTransform(
        size=size, mean=IMAGENET_MEAN, std=IMAGENET_STD, train=train
    )
