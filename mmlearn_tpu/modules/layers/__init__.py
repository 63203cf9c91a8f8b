"""Reusable model layers."""

from mmlearn_tpu.modules.layers.attention import Attention
from mmlearn_tpu.modules.layers.embedding import (
    ConvEmbed,
    PatchEmbed,
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    interpolate_pos_embed,
)
from mmlearn_tpu.modules.layers.logit_scaling import LearnableLogitScaling
from mmlearn_tpu.modules.layers.mlp import MLP
from mmlearn_tpu.modules.layers.normalization import L2Norm, l2_normalize
from mmlearn_tpu.modules.layers.patch_dropout import PatchDropout
from mmlearn_tpu.modules.layers.transformer_block import Block, DropPath, drop_path

__all__ = [
    "Attention",
    "Block",
    "ConvEmbed",
    "DropPath",
    "L2Norm",
    "LearnableLogitScaling",
    "MLP",
    "PatchDropout",
    "PatchEmbed",
    "drop_path",
    "get_1d_sincos_pos_embed",
    "get_2d_sincos_pos_embed",
    "interpolate_pos_embed",
    "l2_normalize",
]
