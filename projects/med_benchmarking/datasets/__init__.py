"""Med-benchmarking dataset registrations + transforms.

Parity: /root/reference/projects/med_benchmarking/datasets/__init__.py
(registrations at lines 10-57, ``med_clip_vision_transform`` at 60-105).
"""

from mmlearn_tpu.conf import external_store
from mmlearn_tpu.datasets.builtin.image_utils import CLIP_MEAN, CLIP_STD, ImageTransform

from projects.med_benchmarking.datasets.classification import (
    BACH,
    HAM10000,
    LC25000,
    MedMNISTPlus,
    NckCrc,
    PCAM,
    PadUfes20,
    SICAP,
)
from projects.med_benchmarking.datasets.image_text import (
    MIMICIVCXR,
    MedVQA,
    PMCOA,
    Quilt,
    ROCO,
)


@external_store(
    group="datasets/transforms",
    name="med_clip_vision_transform",
    populate_full_signature=False,
)
def med_clip_vision_transform(
    image_crop_size: int = 224, job_type: str = "train"
) -> ImageTransform:
    """CLIP-stat train/eval transform (reference: datasets/__init__.py:60-105)."""
    return ImageTransform(
        size=image_crop_size,
        mean=CLIP_MEAN,
        std=CLIP_STD,
        train=(job_type == "train"),
    )


__all__ = [
    "BACH",
    "HAM10000",
    "LC25000",
    "MIMICIVCXR",
    "MedMNISTPlus",
    "MedVQA",
    "NckCrc",
    "PCAM",
    "PMCOA",
    "PadUfes20",
    "Quilt",
    "ROCO",
    "SICAP",
    "med_clip_vision_transform",
]
