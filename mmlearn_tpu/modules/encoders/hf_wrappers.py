"""HF encoder factories: BERT-family text + ViT vision.

Parity targets:
- ``HFTextEncoder`` (/root/reference/mmlearn/modules/encoders/text.py):
  wraps ``AutoModelForTextEncoding`` (BERT-family), rejects decoder models,
  optional pooling; here: build a native :class:`BertTextEncoder` matching the
  checkpoint config + register a ``convert_bert`` weight loader.
- ``TimmViT`` (/root/reference/mmlearn/modules/encoders/vision.py:33-176):
  any timm ViT with projection; here: HF ``ViTModel`` checkpoints convert into
  the native :class:`VisionTransformer` (timm is not a dependency; the HF hub
  hosts the same ViT weights).

``freeze_layers``/``peft_config`` are framework-level (mmlearn_tpu.peft).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.hf_utils import (
    _layernorm,
    _linear,
    _np,
    convert_bert,
    register_pretrained_loader,
    stack_block_params,
)


def _jnp_dtype(dtype: Any):
    import jax.numpy as jnp

    return jnp.dtype(dtype) if dtype is not None else jnp.float32


@store(group="modules/encoders", name="HFTextEncoder",
       populate_full_signature=False)
def HFTextEncoder(
    model_name_or_path: Any = "bert-base-uncased",
    pooling: str = "pooler",
    proj_dim: Optional[int] = None,
    dtype: Any = None,
    scan_blocks: bool = False,
):
    """BERT-family text encoder with converted HF weights.

    Rejects decoder-only models (reference text.py:81-82).
    """
    if isinstance(model_name_or_path, str):
        from transformers import AutoModel

        model = AutoModel.from_pretrained(model_name_or_path)
    else:
        model = model_name_or_path
    config = model.config
    if getattr(config, "is_decoder", False):
        raise ValueError(
            "HFTextEncoder requires an encoder model; got a decoder "
            "(reference rejects decoders too, text.py:81-82)"
        )

    from mmlearn_tpu.modules.encoders.bert import BertTextEncoder

    encoder = BertTextEncoder(
        vocab_size=config.vocab_size,
        max_length=config.max_position_embeddings,
        embed_dim=config.hidden_size,
        depth=config.num_hidden_layers,
        num_heads=config.num_attention_heads,
        mlp_ratio=config.intermediate_size / config.hidden_size,
        norm_eps=config.layer_norm_eps,
        pooling=pooling,
        proj_dim=proj_dim,
        scan_blocks=scan_blocks,
        dtype=_jnp_dtype(dtype),
    )
    sd = model.state_dict()
    depth = config.num_hidden_layers

    def _load():
        params = convert_bert(sd, depth, num_heads=config.num_attention_heads)
        if scan_blocks:
            # BertTextEncoder's scan path is blocks/block (post-LN stack)
            params = stack_block_params(
                params, depth, out_path=("blocks", "block")
            )
        return params

    return register_pretrained_loader(encoder, _load)


def convert_hf_vit(state_dict: Any, depth: int, prefix: str = "vit",
                   num_heads: Optional[int] = None) -> dict:
    """HF ``ViTModel`` → our VisionTransformer params.

    Target module config: ``use_cls_token=True, learned_pos_embed=True,
    final_norm=True, act_layer='gelu', qkv_bias=True``.
    """
    sd = state_dict
    p = f"{prefix}." if prefix else ""
    params: dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": _np(
                    sd[f"{p}embeddings.patch_embeddings.projection.weight"]
                ).transpose(2, 3, 1, 0),
                "bias": _np(
                    sd[f"{p}embeddings.patch_embeddings.projection.bias"]
                ),
            }
        },
        "cls_token": _np(sd[f"{p}embeddings.cls_token"]).reshape(1, 1, -1),
        "pos_embed": _np(sd[f"{p}embeddings.position_embeddings"]),
        "norm": _layernorm(sd, f"{p}layernorm"),
    }
    from mmlearn_tpu.ops.fused_attention import interleave_qkv_heads

    if num_heads is None:
        num_heads = params["cls_token"].shape[-1] // 64
    for i in range(depth):
        lp = f"{p}encoder.layer.{i}"
        kernels = [
            _np(sd[f"{lp}.attention.attention.{n}.weight"]).T
            for n in ("query", "key", "value")
        ]
        biases = [
            _np(sd[f"{lp}.attention.attention.{n}.bias"])
            for n in ("query", "key", "value")
        ]
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{lp}.layernorm_before"),
            "attn": {
                "qkv": {
                    "kernel": interleave_qkv_heads(
                        np.concatenate(kernels, axis=1), num_heads
                    ),
                    "bias": interleave_qkv_heads(
                        np.concatenate(biases), num_heads
                    ),
                },
                "proj": _linear(sd, f"{lp}.attention.output.dense"),
            },
            "norm2": _layernorm(sd, f"{lp}.layernorm_after"),
            "mlp": {
                "fc1": _linear(sd, f"{lp}.intermediate.dense"),
                "fc2": _linear(sd, f"{lp}.output.dense"),
            },
        }
    return params


@store(group="modules/encoders", name="HFViTEncoder",
       populate_full_signature=False)
def HFViTEncoder(
    model_name_or_path: Any = "google/vit-base-patch16-224-in21k",
    global_pool: str = "cls",
    proj_dim: Optional[int] = None,
    dtype: Any = None,
    scan_blocks: bool = False,
    remat: bool = False,
):
    """ViT vision encoder with converted HF weights (TimmViT equivalent)."""
    if isinstance(model_name_or_path, str):
        from transformers import ViTModel

        model = ViTModel.from_pretrained(model_name_or_path)
    else:
        model = model_name_or_path
    config = model.config

    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    encoder = VisionTransformer(
        img_size=config.image_size,
        patch_size=config.patch_size,
        embed_dim=config.hidden_size,
        depth=config.num_hidden_layers,
        num_heads=config.num_attention_heads,
        mlp_ratio=config.intermediate_size / config.hidden_size,
        qkv_bias=config.qkv_bias,
        use_cls_token=True,
        learned_pos_embed=True,
        final_norm=True,
        act_layer="gelu",
        norm_eps=config.layer_norm_eps,
        global_pool=global_pool,
        proj_dim=proj_dim,
        scan_blocks=scan_blocks,
        remat=remat,
        dtype=_jnp_dtype(dtype),
    )
    sd = model.state_dict()
    # ViTModel checkpoints may or may not carry the "vit." prefix
    prefix = "vit" if any(k.startswith("vit.") for k in sd) else ""
    depth = config.num_hidden_layers

    def _load():
        params = convert_hf_vit(
            sd, depth, prefix=prefix, num_heads=config.num_attention_heads
        )
        return stack_block_params(params, depth) if scan_blocks else params

    return register_pretrained_loader(encoder, _load)


@store(group="modules/encoders", name="TimmViT", populate_full_signature=False)
def TimmViT(
    model_name: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    state_dict: Any = None,
    projection_dim: int = 768,
    num_heads: Optional[int] = None,
    global_pool: str = "cls",
    dtype: Any = None,
    scan_blocks: bool = False,
    remat: bool = False,
):
    """timm ViT encoder with converted weights + projection head.

    Parity: reference ``TimmViT`` wraps ``timm.create_model(model_name,
    num_classes=projection_dim)`` (/root/reference/mmlearn/modules/encoders/
    vision.py:33-176). Here the timm checkpoint's weights convert into the
    native :class:`VisionTransformer`; geometry is inferred from the state
    dict. Accepts ``model_name`` (requires the optional timm package),
    ``checkpoint_path`` (a torch ``.pth``/``.bin`` state dict), or an
    in-memory ``state_dict``.
    """
    from mmlearn_tpu.hf_utils import (
        convert_timm_vit,
        register_pretrained_loader,
        stack_block_params,
        timm_vit_geometry,
    )

    sd = state_dict
    if sd is None and checkpoint_path is not None:
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        # unwrap trainer checkpoints: Lightning-style 'state_dict' and
        # timm's own train script, which saves under 'model'
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    if sd is None and model_name is not None:
        try:
            import timm
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "TimmViT by model_name requires the timm package; pass "
                "checkpoint_path or state_dict instead"
            ) from exc
        sd = timm.create_model(model_name, pretrained=True).state_dict()
    if sd is None:
        raise ValueError(
            "TimmViT requires one of model_name / checkpoint_path / state_dict"
        )
    geo = timm_vit_geometry(sd, num_heads=num_heads)

    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    encoder = VisionTransformer(
        img_size=geo["img_size"],
        patch_size=geo["patch_size"],
        embed_dim=geo["embed_dim"],
        depth=geo["depth"],
        num_heads=geo["num_heads"],
        mlp_ratio=geo["mlp_ratio"],
        qkv_bias=geo["qkv_bias"],
        use_cls_token=True,
        learned_pos_embed=True,
        final_norm=True,
        act_layer="gelu",
        global_pool=global_pool,
        proj_dim=projection_dim,
        scan_blocks=scan_blocks,
        remat=remat,
        dtype=_jnp_dtype(dtype),
    )
    depth = geo["depth"]

    def _load():
        params = convert_timm_vit(sd, depth, num_heads=geo["num_heads"])
        return stack_block_params(params, depth) if scan_blocks else params

    return register_pretrained_loader(encoder, _load)
