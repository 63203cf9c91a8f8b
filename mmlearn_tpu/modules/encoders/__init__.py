"""Model zoo: vision / text encoders."""

from mmlearn_tpu.modules.encoders.base import EncoderOutput
from mmlearn_tpu.modules.encoders.bert import BertTextEncoder
from mmlearn_tpu.modules.encoders.clip import (
    HFCLIPTextEncoder,
    HFCLIPTextEncoderWithProjection,
    HFCLIPVisionEncoder,
    HFCLIPVisionEncoderWithProjection,
)
from mmlearn_tpu.modules.encoders.hf_wrappers import (
    HFTextEncoder,
    HFViTEncoder,
)
from mmlearn_tpu.modules.encoders.text import TextTransformer
from mmlearn_tpu.modules.encoders.vision import (
    VisionTransformer,
    VisionTransformerPredictor,
    apply_masks,
    repeat_interleave_batch,
    vit_base,
    vit_giant,
    vit_huge,
    vit_large,
    vit_predictor,
    vit_small,
    vit_tiny,
)

__all__ = [
    "BertTextEncoder",
    "EncoderOutput",
    "HFCLIPTextEncoder",
    "HFCLIPTextEncoderWithProjection",
    "HFCLIPVisionEncoder",
    "HFCLIPVisionEncoderWithProjection",
    "HFTextEncoder",
    "HFViTEncoder",
    "TextTransformer",
    "VisionTransformer",
    "VisionTransformerPredictor",
    "apply_masks",
    "repeat_interleave_batch",
    "vit_base",
    "vit_giant",
    "vit_huge",
    "vit_large",
    "vit_predictor",
    "vit_small",
    "vit_tiny",
]
