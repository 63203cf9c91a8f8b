"""HF CLIP encoder factories (native modules + converted weights).

Capability parity with the reference's four CLIP wrappers
(/root/reference/mmlearn/modules/encoders/clip.py: ``HFCLIPTextEncoder``,
``HFCLIPVisionEncoder``, ``HFCLIPTextEncoderWithProjection``,
``HFCLIPVisionEncoderWithProjection``). Instead of wrapping torch modules,
each factory builds a native :class:`VisionTransformer`/:class:`TextTransformer`
matching the checkpoint's config and registers a weight-conversion loader that
``ContrastivePretraining.init_params`` applies. Reference quirks preserved:
``PatchDropout`` injected after embeddings (clip.py:222-225 → the module's
``patch_drop_rate``), ``use_all_token_embeddings`` pooling option
(clip.py:334-349), pre/post layernorm handling.

``freeze_layers`` is handled by the framework-level optax masks
(mmlearn_tpu.peft.freeze_layers_mask) rather than per-module flags.
"""

from __future__ import annotations

from typing import Any

from mmlearn_tpu.conf import store
from mmlearn_tpu.hf_utils import (
    clip_modules_from_config,
    convert_clip_text,
    convert_clip_vision,
    register_pretrained_loader,
)


def _load_hf_clip(pretrained_model_name_or_path: Any):
    if not isinstance(pretrained_model_name_or_path, str):
        return pretrained_model_name_or_path  # an already-built CLIPModel
    from transformers import CLIPModel

    return CLIPModel.from_pretrained(pretrained_model_name_or_path)


def _dtype(dtype: Any):
    import jax.numpy as jnp

    return jnp.dtype(dtype) if dtype is not None else jnp.float32


def _vision_module(
    model, with_projection, patch_drop_rate, use_all_token_embeddings, dtype,
    scan_blocks=False, remat=False,
):
    import dataclasses

    from mmlearn_tpu.hf_utils import stack_block_params

    vision, _ = clip_modules_from_config(model.config, dtype=_dtype(dtype))
    vision = dataclasses.replace(
        vision,
        proj_dim=model.config.projection_dim if with_projection else None,
        patch_drop_rate=patch_drop_rate,
        # reference use_all_token_embeddings projects EVERY token
        # (clip.py:334,464) — per-token output, consumers pool downstream
        global_pool="none" if use_all_token_embeddings else "cls",
        proj_all_tokens=use_all_token_embeddings,
        scan_blocks=scan_blocks,
        remat=remat,
    )
    sd = model.state_dict()
    depth = model.config.vision_config.num_hidden_layers
    proj_key = "visual_projection.weight" if with_projection else None

    num_heads = model.config.vision_config.num_attention_heads

    def _load():
        params = convert_clip_vision(
            sd, depth, projection_key=proj_key, num_heads=num_heads
        )
        return stack_block_params(params, depth) if scan_blocks else params

    return register_pretrained_loader(vision, _load)


def _text_module(
    model, with_projection, use_all_token_embeddings, dtype,
    scan_blocks=False, remat=False,
):
    import dataclasses

    from mmlearn_tpu.hf_utils import stack_block_params

    _, text = clip_modules_from_config(model.config, dtype=_dtype(dtype))
    text = dataclasses.replace(
        text,
        proj_dim=model.config.projection_dim if with_projection else None,
        pooling="eos",
        proj_all_tokens=use_all_token_embeddings,
        scan_blocks=scan_blocks,
        remat=remat,
        # causal + eos pooling never reads padded positions — the elided
        # padding mask is numerics-identical and unlocks the fused MHA
        # kernel's unmasked (~2x faster) path
        elide_padding_mask=not use_all_token_embeddings,
    )
    sd = model.state_dict()
    depth = model.config.text_config.num_hidden_layers
    proj_key = "text_projection.weight" if with_projection else None

    num_heads = model.config.text_config.num_attention_heads

    def _load():
        params = convert_clip_text(
            sd, depth, projection_key=proj_key, num_heads=num_heads
        )
        return stack_block_params(params, depth) if scan_blocks else params

    return register_pretrained_loader(text, _load)


@store(group="modules/encoders", name="HFCLIPVisionEncoder",
       populate_full_signature=False)
def HFCLIPVisionEncoder(
    pretrained_model_name_or_path: Any = "openai/clip-vit-base-patch16",
    patch_dropout_rate: float = 0.0,
    use_all_token_embeddings: bool = False,
    dtype: Any = None,
    scan_blocks: bool = False,
    remat: bool = False,
):
    """CLIP vision tower without the projection head."""
    model = _load_hf_clip(pretrained_model_name_or_path)
    return _vision_module(
        model, False, patch_dropout_rate, use_all_token_embeddings, dtype,
        scan_blocks=scan_blocks, remat=remat,
    )


@store(group="modules/encoders", name="HFCLIPVisionEncoderWithProjection",
       populate_full_signature=False)
def HFCLIPVisionEncoderWithProjection(
    pretrained_model_name_or_path: Any = "openai/clip-vit-base-patch16",
    patch_dropout_rate: float = 0.0,
    use_all_token_embeddings: bool = False,
    dtype: Any = None,
    scan_blocks: bool = False,
    remat: bool = False,
):
    """CLIP vision tower with the contrastive projection head."""
    model = _load_hf_clip(pretrained_model_name_or_path)
    return _vision_module(
        model, True, patch_dropout_rate, use_all_token_embeddings, dtype,
        scan_blocks=scan_blocks, remat=remat,
    )


@store(group="modules/encoders", name="HFCLIPTextEncoder",
       populate_full_signature=False)
def HFCLIPTextEncoder(
    pretrained_model_name_or_path: Any = "openai/clip-vit-base-patch16",
    use_all_token_embeddings: bool = False,
    dtype: Any = None,
    scan_blocks: bool = False,
    remat: bool = False,
):
    """CLIP text tower without the projection head."""
    model = _load_hf_clip(pretrained_model_name_or_path)
    return _text_module(model, False, use_all_token_embeddings, dtype,
                        scan_blocks=scan_blocks, remat=remat)


@store(group="modules/encoders", name="HFCLIPTextEncoderWithProjection",
       populate_full_signature=False)
def HFCLIPTextEncoderWithProjection(
    pretrained_model_name_or_path: Any = "openai/clip-vit-base-patch16",
    use_all_token_embeddings: bool = False,
    dtype: Any = None,
    scan_blocks: bool = False,
    remat: bool = False,
):
    """CLIP text tower with the contrastive projection head."""
    model = _load_hf_clip(pretrained_model_name_or_path)
    return _text_module(model, True, use_all_token_embeddings, dtype,
                        scan_blocks=scan_blocks, remat=remat)
