"""Built-in dataset wrappers (registered into the ``datasets`` config group).

Parity inventory vs the reference (SURVEY.md §2.4): ImageNet, CheXpert,
NIHCXR, LLVIP, LibriSpeech, NYUv2, SUNRGBD — plus synthetic datasets for
smoke tests/benchmarks.
"""

from mmlearn_tpu.datasets.builtin.chexpert import CheXpert
from mmlearn_tpu.datasets.builtin.image_utils import ImageTransform
from mmlearn_tpu.datasets.builtin.imagenet import ImageNet
from mmlearn_tpu.datasets.builtin.librispeech import LibriSpeech
from mmlearn_tpu.datasets.builtin.llvip import LLVIP
from mmlearn_tpu.datasets.builtin.nihcxr import NIHCXR
from mmlearn_tpu.datasets.builtin.nyuv2 import NYUv2
from mmlearn_tpu.datasets.builtin.sunrgbd import SUNRGBD
from mmlearn_tpu.datasets.builtin.synthetic import SyntheticImages, SyntheticImageText

__all__ = [
    "CheXpert",
    "ImageNet",
    "ImageTransform",
    "LLVIP",
    "LibriSpeech",
    "NIHCXR",
    "NYUv2",
    "SUNRGBD",
    "SyntheticImageText",
    "SyntheticImages",
]
