"""HuggingFace checkpoint → native Flax parameter conversion.

Capability parity with the reference's HF *wrappers*
(/root/reference/mmlearn/modules/encoders/clip.py, text.py and
mmlearn/hf_utils.py): instead of wrapping torch modules, HF weights are
converted into the native encoders' parameter trees
(:class:`~mmlearn_tpu.modules.encoders.vision.VisionTransformer`,
:class:`~mmlearn_tpu.modules.encoders.text.TextTransformer`), preserving the
CLIP quirks the reference handles explicitly (pre_layrnorm / post_layernorm,
clip.py:225,468; eos pooling via argmax of token ids).

Layout notes:
- HF ``nn.Linear`` weights are ``(out, in)`` → transposed to flax ``(in, out)``;
- HF separate q/k/v projections are fused into our ``qkv`` kernel by
  concatenation along the output dim;
- HF conv patch embedding ``(D, C, P, P)`` → flax HWIO ``(P, P, C, D)``.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Mapping, Optional

import numpy as np

logger = logging.getLogger(__name__)

#: Pretrained-weight loaders attached to module instances (flax modules are
#: frozen dataclasses, so the association lives here). The value holds a
#: STRONG reference to the module: without it, a GC'd module's reused id()
#: could silently return another encoder's loader. The pinned memory (the
#: module + the loader's captured state dict) is bounded by the number of
#: pretrained encoders constructed, which is config-sized.
_PRETRAINED_LOADERS: dict[int, tuple[Any, Any]] = {}


def register_pretrained_loader(module: Any, loader: Any) -> Any:
    _PRETRAINED_LOADERS[id(module)] = (module, loader)
    return module


def get_pretrained_params(module: Any) -> Optional[dict]:
    entry = _PRETRAINED_LOADERS.get(id(module))
    if entry is None or entry[0] is not module:
        return None
    loader = entry[1]
    return loader() if callable(loader) else loader


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Mapping[str, Any], prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _fused_qkv(sd: Mapping[str, Any], prefix: str, num_heads: int) -> dict:
    """Fuse HF q/k/v projections into one (in, 3*out) head-major kernel.

    The Attention module packs qkv head-major for the fused Pallas kernel
    (mmlearn_tpu/ops/fused_attention.py) — ``interleave_qkv_heads`` permutes
    the [q|k|v]-major concat into that layout.
    """
    from mmlearn_tpu.ops.fused_attention import interleave_qkv_heads

    kernels = [
        _np(sd[f"{prefix}.{n}.weight"]).T for n in ("q_proj", "k_proj", "v_proj")
    ]
    out = {
        "kernel": interleave_qkv_heads(
            np.concatenate(kernels, axis=1), num_heads
        )
    }
    if f"{prefix}.q_proj.bias" in sd:
        biases = [
            _np(sd[f"{prefix}.{n}.bias"]) for n in ("q_proj", "k_proj", "v_proj")
        ]
        out["bias"] = interleave_qkv_heads(np.concatenate(biases), num_heads)
    return out


def _clip_block(sd: Mapping[str, Any], prefix: str, num_heads: int) -> dict:
    return {
        "norm1": _layernorm(sd, f"{prefix}.layer_norm1"),
        "attn": {
            "qkv": _fused_qkv(sd, f"{prefix}.self_attn", num_heads),
            "proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "norm2": _layernorm(sd, f"{prefix}.layer_norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def convert_clip_vision(
    state_dict: Mapping[str, Any],
    depth: int,
    prefix: str = "vision_model",
    projection_key: Optional[str] = "visual_projection.weight",
    num_heads: Optional[int] = None,
) -> dict:
    """HF ``CLIPVisionModel(WithProjection)`` → our VisionTransformer params.

    Target module config: ``use_cls_token=True, learned_pos_embed=True,
    pre_norm=True, final_norm=True, act_layer='quick_gelu',
    global_pool='cls'`` (+ ``proj_dim`` if the projection is converted).

    Note: HF applies ``post_layernorm`` only to the pooled CLS token; we
    apply the same LN to all tokens — identical pooled output (LN is
    per-token), sequence outputs differ by that LN.
    """
    sd = state_dict
    params: dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": _np(
                    sd[f"{prefix}.embeddings.patch_embedding.weight"]
                ).transpose(2, 3, 1, 0),
            }
        },
        "cls_token": _np(sd[f"{prefix}.embeddings.class_embedding"]).reshape(1, 1, -1),
        "pos_embed": _np(sd[f"{prefix}.embeddings.position_embedding.weight"])[None],
        "norm_pre": _layernorm(sd, f"{prefix}.pre_layrnorm"),
        "norm": _layernorm(sd, f"{prefix}.post_layernorm"),
    }
    if f"{prefix}.embeddings.patch_embedding.bias" in sd:
        params["patch_embed"]["proj"]["bias"] = _np(
            sd[f"{prefix}.embeddings.patch_embedding.bias"]
        )
    if num_heads is None:
        num_heads = _infer_num_heads(params["cls_token"].shape[-1])
    for i in range(depth):
        params[f"blocks_{i}"] = _clip_block(
            sd, f"{prefix}.encoder.layers.{i}", num_heads
        )
    if projection_key and projection_key in sd:
        params["proj"] = {"kernel": _np(sd[projection_key]).T}
    return params


def convert_clip_text(
    state_dict: Mapping[str, Any],
    depth: int,
    prefix: str = "text_model",
    projection_key: Optional[str] = "text_projection.weight",
    num_heads: Optional[int] = None,
) -> dict:
    """HF ``CLIPTextModel(WithProjection)`` → our TextTransformer params.

    Target module config: ``causal=True, pooling='eos',
    act_layer='quick_gelu'``.
    """
    sd = state_dict
    params: dict[str, Any] = {
        "token_embedding": {
            "embedding": _np(sd[f"{prefix}.embeddings.token_embedding.weight"])
        },
        "pos_embed": _np(sd[f"{prefix}.embeddings.position_embedding.weight"])[None],
        "norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
    }
    if num_heads is None:
        num_heads = params["token_embedding"]["embedding"].shape[-1] // 64
    for i in range(depth):
        params[f"blocks_{i}"] = _clip_block(
            sd, f"{prefix}.encoder.layers.{i}", num_heads
        )
    if projection_key and projection_key in sd:
        params["proj"] = {"kernel": _np(sd[projection_key]).T}
    return params


def clip_modules_from_config(hf_config: Any, dtype: Any = None) -> tuple:
    """Build (vision_module, text_module) matching an HF ``CLIPConfig``."""
    import jax.numpy as jnp

    from mmlearn_tpu.modules.encoders.text import TextTransformer
    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    dtype = dtype or jnp.float32
    v, t = hf_config.vision_config, hf_config.text_config
    vision = VisionTransformer(
        img_size=v.image_size,
        patch_size=v.patch_size,
        embed_dim=v.hidden_size,
        depth=v.num_hidden_layers,
        num_heads=v.num_attention_heads,
        mlp_ratio=v.intermediate_size / v.hidden_size,
        qkv_bias=True,
        use_cls_token=True,
        learned_pos_embed=True,
        pre_norm=True,
        final_norm=True,
        act_layer="quick_gelu",
        norm_eps=v.layer_norm_eps,
        global_pool="cls",
        proj_dim=hf_config.projection_dim,
        patch_embed_bias=False,  # CLIP's patch conv has no bias
        dtype=dtype,
    )
    text = TextTransformer(
        vocab_size=t.vocab_size,
        max_length=t.max_position_embeddings,
        embed_dim=t.hidden_size,
        depth=t.num_hidden_layers,
        num_heads=t.num_attention_heads,
        mlp_ratio=t.intermediate_size / t.hidden_size,
        qkv_bias=True,
        causal=True,
        act_layer="quick_gelu",
        norm_eps=t.layer_norm_eps,
        pooling="eos",
        proj_dim=hf_config.projection_dim,
        dtype=dtype,
    )
    return vision, text


def load_clip_from_hf(
    model_name_or_model: Any, dtype: Any = None
) -> dict[str, Any]:
    """Load an HF CLIP checkpoint into native modules + params.

    Accepts a model name (downloads via transformers — requires network) or
    an already-constructed ``CLIPModel``. Returns
    ``{"vision": (module, params), "text": (module, params),
    "logit_scale": float}``.
    """
    if isinstance(model_name_or_model, str):
        from transformers import CLIPModel

        model = CLIPModel.from_pretrained(model_name_or_model)
    else:
        model = model_name_or_model
    sd = model.state_dict()
    config = model.config
    vision, text = clip_modules_from_config(config, dtype=dtype)
    vision_params = convert_clip_vision(
        sd, config.vision_config.num_hidden_layers,
        num_heads=config.vision_config.num_attention_heads,
    )
    text_params = convert_clip_text(
        sd, config.text_config.num_hidden_layers,
        num_heads=config.text_config.num_attention_heads,
    )
    # HF stores log(scale) (~4.6 for the standard 1/0.07); return both forms
    # so callers can't silently feed the log value where the multiplicative
    # scale is expected (ContrastivePretraining(init_logit_scale=...) takes
    # the multiplicative form)
    log_logit_scale = float(_np(sd["logit_scale"]))
    return {
        "vision": (vision, vision_params),
        "text": (text, text_params),
        "logit_scale": math.exp(log_logit_scale),
        "log_logit_scale": log_logit_scale,
    }


def stack_block_params(
    params: dict, depth: int,
    out_path: tuple[str, ...] = ("block_stack", "blocks", "block"),
) -> dict:
    """Convert per-layer ``blocks_{i}`` subtrees into the nn.scan layout.

    Scan-format modules (``scan_blocks=True``) expect stacked params with a
    leading depth axis under ``block_stack/blocks/block``
    (VisionTransformer/TextTransformer) or ``blocks/block``
    (BertTextEncoder — pass ``out_path=("blocks", "block")``).
    """
    import jax

    blocks = [params.pop(f"blocks_{i}") for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: np.stack([_np(x) for x in xs]), *blocks)
    node: dict = stacked
    for key in reversed(out_path):
        node = {key: node}
    params.update(node)
    return params


# -- BERT-family (HFTextEncoder parity) -----------------------------------------


def convert_bert(
    state_dict: Mapping[str, Any], depth: int, prefix: str = "",
    num_heads: Optional[int] = None,
) -> dict:
    """HF ``BertModel`` → our BertTextEncoder params."""
    sd = state_dict
    p = f"{prefix}." if prefix else ""
    params: dict[str, Any] = {
        "token_embedding": {
            "embedding": _np(sd[f"{p}embeddings.word_embeddings.weight"])
        },
        "position_embedding": {
            "embedding": _np(sd[f"{p}embeddings.position_embeddings.weight"])
        },
        "token_type_embedding": {
            "embedding": _np(sd[f"{p}embeddings.token_type_embeddings.weight"])
        },
        "embed_norm": _layernorm(sd, f"{p}embeddings.LayerNorm"),
    }
    from mmlearn_tpu.ops.fused_attention import interleave_qkv_heads

    if num_heads is None:
        num_heads = params["embed_norm"]["scale"].shape[-1] // 64
    for i in range(depth):
        lp = f"{p}encoder.layer.{i}"
        kernels = [
            _np(sd[f"{lp}.attention.self.{n}.weight"]).T
            for n in ("query", "key", "value")
        ]
        biases = [
            _np(sd[f"{lp}.attention.self.{n}.bias"])
            for n in ("query", "key", "value")
        ]
        params[f"blocks_{i}"] = {
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
            "attn_norm": _layernorm(sd, f"{lp}.attention.output.LayerNorm"),
            "mlp": {
                "fc1": _linear(sd, f"{lp}.intermediate.dense"),
                "fc2": _linear(sd, f"{lp}.output.dense"),
            },
            "mlp_norm": _layernorm(sd, f"{lp}.output.LayerNorm"),
        }
    if f"{p}pooler.dense.weight" in sd:
        params["pooler"] = _linear(sd, f"{p}pooler.dense")
    return params


# -- timm ViT (TimmViT parity) ----------------------------------------------


def _infer_num_heads(embed_dim: int) -> int:
    """Head count for a ViT of this width when the checkpoint doesn't say.

    Head count is NOT stored in ViT state dicts, and 64-dim heads only hold
    through ViT-L: ViT-Huge is 1280/16 (D=80) and ViT-giant 1408/16 (D=88)
    — assuming //64 there silently reshapes the attention into a different
    function. Use the canonical dims table; pass ``num_heads`` explicitly
    for non-standard widths.
    """
    from mmlearn_tpu.modules.encoders.vision import _VIT_DIMS

    for cfg in _VIT_DIMS.values():
        if cfg["embed_dim"] == embed_dim:
            return int(cfg["num_heads"])
    if embed_dim % 64:
        raise ValueError(
            f"Cannot infer num_heads for embed_dim={embed_dim} (not a "
            "standard ViT width and not divisible by 64) — pass num_heads"
        )
    return max(1, embed_dim // 64)


def timm_vit_geometry(
    state_dict: Mapping[str, Any], num_heads: Optional[int] = None
) -> dict:
    """Infer ViT geometry from a timm-format state dict.

    timm naming (reference wraps ``timm.create_model``,
    /root/reference/mmlearn/modules/encoders/vision.py:33-176):
    ``cls_token``, ``pos_embed``, ``patch_embed.proj.*``,
    ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}.*``,
    final ``norm.*``. An explicit ``num_heads`` skips the head-count
    inference (the one geometry fact a ViT state dict does not determine).
    """
    sd = state_dict
    embed_dim = int(_np(sd["cls_token"]).shape[-1])
    patch = int(_np(sd["patch_embed.proj.weight"]).shape[-1])
    n_pos = int(_np(sd["pos_embed"]).shape[1])
    grid = int(round((n_pos - 1) ** 0.5))
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    mlp_hidden = int(_np(sd["blocks.0.mlp.fc1.weight"]).shape[0])
    return {
        "img_size": grid * patch,
        "patch_size": patch,
        "embed_dim": embed_dim,
        "depth": depth,
        "mlp_ratio": mlp_hidden / embed_dim,
        "num_heads": (
            int(num_heads) if num_heads is not None
            else _infer_num_heads(embed_dim)
        ),
        "qkv_bias": "blocks.0.attn.qkv.bias" in sd,
    }


def convert_timm_vit(
    state_dict: Mapping[str, Any], depth: Optional[int] = None,
    num_heads: Optional[int] = None,
) -> dict:
    """timm ``VisionTransformer`` state dict → our VisionTransformer params.

    Target module config: ``use_cls_token=True, learned_pos_embed=True,
    final_norm=True, act_layer='gelu'`` (augreg/deit-style checkpoints).
    timm packs the fused qkv as rows ``[q; k; v]`` — transposed that is the
    same [q|k|v]-major column packing our ``Attention`` uses.
    """
    from mmlearn_tpu.ops.fused_attention import interleave_qkv_heads

    sd = state_dict
    geo = timm_vit_geometry(sd, num_heads=num_heads)
    if depth is None:
        depth = geo["depth"]
    num_heads = geo["num_heads"]
    params: dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": _np(sd["patch_embed.proj.weight"]).transpose(
                    2, 3, 1, 0
                ),
                "bias": _np(sd["patch_embed.proj.bias"]),
            }
        },
        "cls_token": _np(sd["cls_token"]).reshape(1, 1, -1),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        lp = f"blocks.{i}"
        qkv = {
            "kernel": interleave_qkv_heads(
                _np(sd[f"{lp}.attn.qkv.weight"]).T, num_heads
            )
        }
        if f"{lp}.attn.qkv.bias" in sd:
            qkv["bias"] = interleave_qkv_heads(
                _np(sd[f"{lp}.attn.qkv.bias"]), num_heads
            )
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{lp}.norm1"),
            "attn": {
                "qkv": qkv,
                "proj": _linear(sd, f"{lp}.attn.proj"),
            },
            "norm2": _layernorm(sd, f"{lp}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                "fc2": _linear(sd, f"{lp}.mlp.fc2"),
            },
        }
    if "head.weight" in sd:
        # TimmViT's projection head (timm num_classes=projection_dim →
        # biased Linear named ``head``, reference vision.py:33-176) → our
        # ``proj`` (build the module with proj_bias=True)
        params["proj"] = _linear(sd, "head")
    return params


def convert_bert_mlm(
    state_dict: Mapping[str, Any],
    depth: int,
    prefix: str = "",
    num_heads: Optional[int] = None,
) -> dict:
    """HF ``BertForMaskedLM``-shaped tower → BarcodeBERT-style params.

    Target layout is ``projects.bioscan_clip.encoders.BarcodeBERT``: the
    ``bert`` trunk (via :func:`convert_bert`), the MLM prediction-head
    ``transform`` dense + ``transform_norm``, and the ``decoder`` projection
    (the reference swaps the MLM decoder for a ``Linear(projection_dim)`` —
    reference projects/bioscan_clip/encoders.py:72-75)."""
    p = f"{prefix}." if prefix else ""
    params: dict[str, Any] = {
        "bert": convert_bert(
            state_dict, depth, prefix=f"{p}bert", num_heads=num_heads
        )
    }
    if f"{p}cls.predictions.transform.dense.weight" in state_dict:
        params["transform"] = _linear(
            state_dict, f"{p}cls.predictions.transform.dense"
        )
        params["transform_norm"] = _layernorm(
            state_dict, f"{p}cls.predictions.transform.LayerNorm"
        )
    if f"{p}cls.predictions.decoder.weight" in state_dict:
        params["decoder"] = _linear(state_dict, f"{p}cls.predictions.decoder")
    return params


def _ijepa_block(sd: Mapping[str, Any], lp: str, num_heads: int) -> dict:
    """One reference I-JEPA transformer block → our Block params.

    The reference MLP is an ``nn.Sequential`` (Linear, GELU, Dropout, Linear,
    Dropout — reference mlp.py:109-127), so its linear layers are keyed
    ``mlp.0`` / ``mlp.3``.
    """
    from mmlearn_tpu.ops.fused_attention import interleave_qkv_heads

    qkv = {
        "kernel": interleave_qkv_heads(
            _np(sd[f"{lp}.attn.qkv.weight"]).T, num_heads
        )
    }
    if f"{lp}.attn.qkv.bias" in sd:
        qkv["bias"] = interleave_qkv_heads(
            _np(sd[f"{lp}.attn.qkv.bias"]), num_heads
        )
    return {
        "norm1": _layernorm(sd, f"{lp}.norm1"),
        "attn": {"qkv": qkv, "proj": _linear(sd, f"{lp}.attn.proj")},
        "norm2": _layernorm(sd, f"{lp}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{lp}.mlp.0"),
            "fc2": _linear(sd, f"{lp}.mlp.3"),
        },
    }


def convert_ijepa_vit(
    state_dict: Mapping[str, Any], depth: int, num_heads: int
) -> dict:
    """Reference I-JEPA ``VisionTransformer`` state dict → our params.

    Source format: /root/reference/mmlearn/modules/encoders/vision.py:179-394
    (``patch_embed.proj``, ``blocks.{i}.*`` with Sequential MLPs, final
    ``norm``; the sincos ``pos_embed`` buffer is dropped — ours is computed in
    forward). Target module config: ``use_cls_token=False,
    learned_pos_embed=False, final_norm=True, norm_eps=1e-5``.
    """
    sd = state_dict
    params: dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": _np(sd["patch_embed.proj.weight"]).transpose(
                    2, 3, 1, 0
                ),
                "bias": _np(sd["patch_embed.proj.bias"]),
            }
        },
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _ijepa_block(sd, f"blocks.{i}", num_heads)
    return params


def convert_ijepa_predictor(
    state_dict: Mapping[str, Any], depth: int, num_heads: int
) -> dict:
    """Reference ``VisionTransformerPredictor`` state dict → our params.

    Source format: reference vision.py:397-569 (``predictor_embed``,
    ``mask_token``, ``predictor_blocks.{i}.*``, ``predictor_norm``,
    ``predictor_proj``; the sincos ``predictor_pos_embed`` buffer is
    dropped).
    """
    sd = state_dict
    params: dict[str, Any] = {
        "predictor_embed": _linear(sd, "predictor_embed"),
        "mask_token": _np(sd["mask_token"]),
        "norm": _layernorm(sd, "predictor_norm"),
        "predictor_proj": _linear(sd, "predictor_proj"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _ijepa_block(
            sd, f"predictor_blocks.{i}", num_heads
        )
    return params
