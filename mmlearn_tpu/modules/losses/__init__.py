"""Loss functions."""

from mmlearn_tpu.modules.losses.contrastive import (
    ContrastiveLoss,
    LossPairSpec,
    masked_infonce,
)
from mmlearn_tpu.modules.losses.data2vec import Data2VecLoss

__all__ = ["ContrastiveLoss", "Data2VecLoss", "LossPairSpec", "masked_infonce"]
