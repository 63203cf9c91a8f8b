"""Native Flax parameters → HuggingFace / timm / reference state dicts.

The exact inverse of :mod:`mmlearn_tpu.hf_utils`: where that module imports
pretrained torch checkpoints into our encoders, this one takes trained
parameters *back* to the torch ecosystem, so a user migrating from the
reference (/root/reference/mmlearn) can round-trip — pretrain here, then
load the result into HF ``CLIPModel``/``BertModel``, a timm ViT, or the
reference's own I-JEPA classes (reference vision.py:179-569) for downstream
torch pipelines.

Every ``export_*`` function inverts the layout work of the matching
``convert_*`` in :mod:`~mmlearn_tpu.hf_utils`:

- flax ``(in, out)`` kernels → ``nn.Linear`` ``(out, in)`` weights;
- the head-major fused ``qkv`` kernel → separate q/k/v projections
  (:func:`~mmlearn_tpu.ops.fused_attention.uninterleave_qkv_heads`);
- flax HWIO patch-conv kernels → torch ``(D, C, P, P)``;
- scan-stacked block params are accepted directly (auto-unstacked).

Outputs are plain ``{name: np.float32 ndarray}`` dicts —
:func:`to_torch_state_dict` wraps them as torch tensors for
``load_state_dict``. bf16/f32 training dtypes are cast to float32 (torch
checkpoints are conventionally f32; numpy bf16 round-trips through
ml_dtypes would not survive ``torch.from_numpy``).
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional

import numpy as np

__all__ = [
    "unstack_block_params",
    "export_clip_vision",
    "export_clip_text",
    "export_clip",
    "export_bert",
    "export_timm_vit",
    "export_ijepa_vit",
    "export_ijepa_predictor",
    "export_module",
    "export_task",
    "export_flax_generic",
    "to_torch_state_dict",
]


def _np(x: Any) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype != np.float32:
        arr = arr.astype(np.float32)
    return arr


def _num_blocks(params: Mapping[str, Any]) -> int:
    depths = [
        int(k.split("_", 1)[1]) for k in params
        if k.startswith("blocks_") and k.split("_", 1)[1].isdigit()
    ]
    if not depths:
        raise ValueError(
            "No blocks_{i} subtrees in params — for scan-format params call "
            "unstack_block_params first (export_* functions do this "
            "automatically when given the module's scan path)"
        )
    return max(depths) + 1


def unstack_block_params(
    params: Mapping[str, Any],
    in_path: tuple[str, ...] = ("block_stack", "blocks", "block"),
) -> dict:
    """Inverse of :func:`mmlearn_tpu.hf_utils.stack_block_params`: split the
    nn.scan stacked block subtree (leading depth axis) back into per-layer
    ``blocks_{i}`` entries. Returns a new dict; no-op if ``in_path`` is
    absent (params already per-layer)."""
    params = dict(params)
    node: Any = params
    for key in in_path[:-1]:
        node = node.get(key) if isinstance(node, Mapping) else None
        if node is None:
            return params
    if not isinstance(node, Mapping) or in_path[-1] not in node:
        return params
    import jax

    stacked = node[in_path[-1]]
    depth = int(jax.tree.leaves(stacked)[0].shape[0])
    for i in range(depth):
        params[f"blocks_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)

    # drop the stacked node, pruning parents that become empty — siblings at
    # ANY level of the path stay (e.g. a future extra param living beside
    # 'blocks' or beside 'block' must survive the unstack)
    def _without(tree: Mapping, path: tuple[str, ...]) -> dict:
        pruned = dict(tree)
        if len(path) == 1:
            pruned.pop(path[0], None)
        else:
            child = _without(pruned[path[0]], path[1:])
            if child:
                pruned[path[0]] = child
            else:
                pruned.pop(path[0])
        return pruned

    without = _without(params, in_path)
    params.clear()
    params.update(without)
    return params


def _linear_out(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _layernorm_out(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _split_qkv(p: Mapping[str, Any], num_heads: int) -> dict:
    """Head-major fused qkv params → {'q'|'k'|'v': {'weight','bias'?}} with
    torch ``(out, in)`` weights."""
    from mmlearn_tpu.ops.fused_attention import uninterleave_qkv_heads

    kernel = uninterleave_qkv_heads(_np(p["kernel"]), num_heads)
    c = kernel.shape[-1] // 3
    out: dict[str, dict] = {
        name: {"weight": kernel[..., i * c:(i + 1) * c].T}
        for i, name in enumerate(("q", "k", "v"))
    }
    if "bias" in p:
        bias = uninterleave_qkv_heads(_np(p["bias"]), num_heads)
        for i, name in enumerate(("q", "k", "v")):
            out[name]["bias"] = bias[i * c:(i + 1) * c]
    return out


def _clip_block_out(
    sd: dict, prefix: str, block: Mapping[str, Any], num_heads: int
) -> None:
    _layernorm_out(sd, f"{prefix}.layer_norm1", block["norm1"])
    qkv = _split_qkv(block["attn"]["qkv"], num_heads)
    for name, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
        sd[f"{prefix}.self_attn.{hf}.weight"] = qkv[name]["weight"]
        if "bias" in qkv[name]:
            sd[f"{prefix}.self_attn.{hf}.bias"] = qkv[name]["bias"]
    _linear_out(sd, f"{prefix}.self_attn.out_proj", block["attn"]["proj"])
    _layernorm_out(sd, f"{prefix}.layer_norm2", block["norm2"])
    _linear_out(sd, f"{prefix}.mlp.fc1", block["mlp"]["fc1"])
    _linear_out(sd, f"{prefix}.mlp.fc2", block["mlp"]["fc2"])


def _prepare(params: Mapping[str, Any]) -> dict:
    """Device-get + unstack scan layouts (both VisionTransformer/
    TextTransformer ``block_stack/blocks/block`` and BertTextEncoder
    ``blocks/block`` paths)."""
    import jax

    params = jax.device_get(dict(params))
    params = unstack_block_params(params)
    params = unstack_block_params(params, in_path=("blocks", "block"))
    return params


def export_clip_vision(
    params: Mapping[str, Any],
    prefix: str = "vision_model",
    projection_key: Optional[str] = "visual_projection.weight",
    num_heads: Optional[int] = None,
) -> dict:
    """Our VisionTransformer params → HF ``CLIPVisionModel(WithProjection)``
    state dict (inverse of :func:`~mmlearn_tpu.hf_utils.convert_clip_vision`).
    """
    params = _prepare(params)
    if num_heads is None:
        from mmlearn_tpu.hf_utils import _infer_num_heads

        num_heads = _infer_num_heads(int(_np(params["cls_token"]).shape[-1]))
    sd: dict[str, np.ndarray] = {}
    proj = params["patch_embed"]["proj"]
    sd[f"{prefix}.embeddings.patch_embedding.weight"] = _np(
        proj["kernel"]
    ).transpose(3, 2, 0, 1)
    if "bias" in proj:
        sd[f"{prefix}.embeddings.patch_embedding.bias"] = _np(proj["bias"])
    sd[f"{prefix}.embeddings.class_embedding"] = _np(
        params["cls_token"]
    ).reshape(-1)
    sd[f"{prefix}.embeddings.position_embedding.weight"] = _np(
        params["pos_embed"]
    )[0]
    _layernorm_out(sd, f"{prefix}.pre_layrnorm", params["norm_pre"])
    _layernorm_out(sd, f"{prefix}.post_layernorm", params["norm"])
    for i in range(_num_blocks(params)):
        _clip_block_out(
            sd, f"{prefix}.encoder.layers.{i}", params[f"blocks_{i}"],
            num_heads,
        )
    if projection_key and "proj" in params:
        sd[projection_key] = _np(params["proj"]["kernel"]).T
    return sd


def export_clip_text(
    params: Mapping[str, Any],
    prefix: str = "text_model",
    projection_key: Optional[str] = "text_projection.weight",
    num_heads: Optional[int] = None,
) -> dict:
    """Our TextTransformer params → HF ``CLIPTextModel(WithProjection)``
    state dict (inverse of :func:`~mmlearn_tpu.hf_utils.convert_clip_text`).
    """
    params = _prepare(params)
    if num_heads is None:
        num_heads = (
            int(_np(params["token_embedding"]["embedding"]).shape[-1]) // 64
        )
    sd: dict[str, np.ndarray] = {}
    sd[f"{prefix}.embeddings.token_embedding.weight"] = _np(
        params["token_embedding"]["embedding"]
    )
    sd[f"{prefix}.embeddings.position_embedding.weight"] = _np(
        params["pos_embed"]
    )[0]
    _layernorm_out(sd, f"{prefix}.final_layer_norm", params["norm"])
    for i in range(_num_blocks(params)):
        _clip_block_out(
            sd, f"{prefix}.encoder.layers.{i}", params[f"blocks_{i}"],
            num_heads,
        )
    if projection_key and "proj" in params:
        sd[projection_key] = _np(params["proj"]["kernel"]).T
    return sd


def export_clip(
    vision_params: Mapping[str, Any],
    text_params: Mapping[str, Any],
    log_logit_scale: float = math.log(1 / 0.07),
    vision_num_heads: Optional[int] = None,
    text_num_heads: Optional[int] = None,
) -> dict:
    """Full HF ``CLIPModel`` state dict from both towers + the learned
    log-logit-scale (ContrastivePretraining stores the log form — pass
    ``float(state.params['log_logit_scale'])``)."""
    sd = export_clip_vision(vision_params, num_heads=vision_num_heads)
    sd.update(export_clip_text(text_params, num_heads=text_num_heads))
    sd["logit_scale"] = np.asarray(float(log_logit_scale), dtype=np.float32)
    return sd


def export_bert(
    params: Mapping[str, Any], prefix: str = "",
    num_heads: Optional[int] = None,
) -> dict:
    """Our BertTextEncoder params → HF ``BertModel`` state dict (inverse of
    :func:`~mmlearn_tpu.hf_utils.convert_bert`)."""
    params = _prepare(params)
    p = f"{prefix}." if prefix else ""
    if num_heads is None:
        num_heads = int(_np(params["embed_norm"]["scale"]).shape[-1]) // 64
    sd: dict[str, np.ndarray] = {
        f"{p}embeddings.word_embeddings.weight": _np(
            params["token_embedding"]["embedding"]
        ),
        f"{p}embeddings.position_embeddings.weight": _np(
            params["position_embedding"]["embedding"]
        ),
        f"{p}embeddings.token_type_embeddings.weight": _np(
            params["token_type_embedding"]["embedding"]
        ),
    }
    _layernorm_out(sd, f"{p}embeddings.LayerNorm", params["embed_norm"])
    for i in range(_num_blocks(params)):
        block = params[f"blocks_{i}"]
        lp = f"{p}encoder.layer.{i}"
        qkv = _split_qkv(block["attn"]["qkv"], num_heads)
        for name, hf in (("q", "query"), ("k", "key"), ("v", "value")):
            sd[f"{lp}.attention.self.{hf}.weight"] = qkv[name]["weight"]
            if "bias" in qkv[name]:
                sd[f"{lp}.attention.self.{hf}.bias"] = qkv[name]["bias"]
        _linear_out(sd, f"{lp}.attention.output.dense", block["attn"]["proj"])
        _layernorm_out(sd, f"{lp}.attention.output.LayerNorm", block["attn_norm"])
        _linear_out(sd, f"{lp}.intermediate.dense", block["mlp"]["fc1"])
        _linear_out(sd, f"{lp}.output.dense", block["mlp"]["fc2"])
        _layernorm_out(sd, f"{lp}.output.LayerNorm", block["mlp_norm"])
    if "pooler" in params:
        _linear_out(sd, f"{p}pooler.dense", params["pooler"])
    return sd


def _vit_block_out(
    sd: dict, lp: str, block: Mapping[str, Any], num_heads: int,
    mlp_keys: tuple[str, str] = ("mlp.fc1", "mlp.fc2"),
) -> None:
    """timm/I-JEPA-format block: fused ``attn.qkv`` stays fused, rows
    ``[q; k; v]`` (the transpose of our [q|k|v]-major column packing)."""
    from mmlearn_tpu.ops.fused_attention import uninterleave_qkv_heads

    _layernorm_out(sd, f"{lp}.norm1", block["norm1"])
    qkv = block["attn"]["qkv"]
    sd[f"{lp}.attn.qkv.weight"] = uninterleave_qkv_heads(
        _np(qkv["kernel"]), num_heads
    ).T
    if "bias" in qkv:
        sd[f"{lp}.attn.qkv.bias"] = uninterleave_qkv_heads(
            _np(qkv["bias"]), num_heads
        )
    _linear_out(sd, f"{lp}.attn.proj", block["attn"]["proj"])
    _layernorm_out(sd, f"{lp}.norm2", block["norm2"])
    _linear_out(sd, f"{lp}.{mlp_keys[0]}", block["mlp"]["fc1"])
    _linear_out(sd, f"{lp}.{mlp_keys[1]}", block["mlp"]["fc2"])


def export_timm_vit(
    params: Mapping[str, Any], num_heads: Optional[int] = None
) -> dict:
    """Our VisionTransformer params → timm ``VisionTransformer`` state dict
    (inverse of :func:`~mmlearn_tpu.hf_utils.convert_timm_vit`). A
    projection head (``proj``, the reference TimmViT's
    ``num_classes=projection_dim`` classifier replacement) exports under
    timm's ``head.*`` naming."""
    params = _prepare(params)
    if num_heads is None:
        from mmlearn_tpu.hf_utils import _infer_num_heads

        num_heads = _infer_num_heads(int(_np(params["cls_token"]).shape[-1]))
    sd: dict[str, np.ndarray] = {
        "patch_embed.proj.weight": _np(
            params["patch_embed"]["proj"]["kernel"]
        ).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": _np(params["patch_embed"]["proj"]["bias"]),
        "cls_token": _np(params["cls_token"]),
        "pos_embed": _np(params["pos_embed"]),
    }
    _layernorm_out(sd, "norm", params["norm"])
    for i in range(_num_blocks(params)):
        _vit_block_out(sd, f"blocks.{i}", params[f"blocks_{i}"], num_heads)
    if "proj" in params:
        _linear_out(sd, "head", params["proj"])
    return sd


def export_ijepa_vit(params: Mapping[str, Any], num_heads: int) -> dict:
    """Our (I-JEPA-config) VisionTransformer params → the reference's
    ``VisionTransformer`` state dict (reference vision.py:179-394; inverse
    of :func:`~mmlearn_tpu.hf_utils.convert_ijepa_vit`).

    A fixed sincos ``pos_embed`` (the I-JEPA default, recomputed from
    geometry at construction on both sides) is not exported; a *learned*
    ``pos_embed`` param, when present, is exported under the same key so
    the trained positions are not silently dropped. A projection head has
    no naming in the reference's I-JEPA classes — exporting one here is an
    error (strip it, or use a cls-token/timm-format tower).
    """
    params = _prepare(params)
    if "proj" in params:
        raise ValueError(
            "the reference I-JEPA ViT format has no projection head — "
            "remove 'proj' from the params or export a timm/CLIP-format "
            "tower instead"
        )
    sd: dict[str, np.ndarray] = {
        "patch_embed.proj.weight": _np(
            params["patch_embed"]["proj"]["kernel"]
        ).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": _np(params["patch_embed"]["proj"]["bias"]),
    }
    if "pos_embed" in params:  # learned positions (learned_pos_embed=True)
        sd["pos_embed"] = _np(params["pos_embed"])
    _layernorm_out(sd, "norm", params["norm"])
    for i in range(_num_blocks(params)):
        _vit_block_out(
            sd, f"blocks.{i}", params[f"blocks_{i}"], num_heads,
            mlp_keys=("mlp.0", "mlp.3"),
        )
    return sd


def export_ijepa_predictor(params: Mapping[str, Any], num_heads: int) -> dict:
    """Our VisionTransformerPredictor params → the reference's predictor
    state dict (reference vision.py:397-569; inverse of
    :func:`~mmlearn_tpu.hf_utils.convert_ijepa_predictor`)."""
    params = _prepare(params)
    sd: dict[str, np.ndarray] = {"mask_token": _np(params["mask_token"])}
    _linear_out(sd, "predictor_embed", params["predictor_embed"])
    _layernorm_out(sd, "predictor_norm", params["norm"])
    _linear_out(sd, "predictor_proj", params["predictor_proj"])
    for i in range(_num_blocks(params)):
        _vit_block_out(
            sd, f"predictor_blocks.{i}", params[f"blocks_{i}"], num_heads,
            mlp_keys=("mlp.0", "mlp.3"),
        )
    return sd


def to_torch_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """numpy state dict → torch tensors (for ``module.load_state_dict``)."""
    import torch

    # copy=True: exported arrays can be read-only views (e.g. npz mmaps) —
    # torch.from_numpy on those trips undefined-behavior warnings
    return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}


def export_module(module: Any, params: Mapping[str, Any]) -> dict:
    """Dispatch a native encoder (module + params) to the matching
    torch-format exporter, using the module's own geometry (no head-count
    inference). Raises ``TypeError`` for module types with no torch-side
    naming convention (custom Flax encoders)."""
    from mmlearn_tpu.modules.encoders.bert import BertTextEncoder
    from mmlearn_tpu.modules.encoders.text import TextTransformer
    from mmlearn_tpu.modules.encoders.vision import (
        VisionTransformer,
        VisionTransformerPredictor,
    )

    if isinstance(module, BertTextEncoder):
        return export_bert(params, num_heads=module.num_heads)
    if isinstance(module, TextTransformer):
        return export_clip_text(params, num_heads=module.num_heads)
    if isinstance(module, VisionTransformerPredictor):
        return export_ijepa_predictor(params, num_heads=module.num_heads)
    if isinstance(module, VisionTransformer):
        if module.pre_norm or module.use_cls_token:
            # CLIP/timm formats carry pos_embed as a tensor; a sincos
            # module computes it in forward — materialize the constant
            # table so the exported torch model is the identical function
            if "pos_embed" not in params:
                from mmlearn_tpu.modules.layers.embedding import (
                    get_2d_sincos_pos_embed,
                )

                grid = module.img_size // module.patch_size
                table = get_2d_sincos_pos_embed(
                    module.embed_dim, grid, cls_token=module.use_cls_token
                )
                params = {
                    **params,
                    "pos_embed": np.asarray(table, np.float32)[None],
                }
            if module.pre_norm:  # CLIP's pre_layrnorm marks the HF config
                return export_clip_vision(params, num_heads=module.num_heads)
            return export_timm_vit(params, num_heads=module.num_heads)
        return export_ijepa_vit(params, num_heads=module.num_heads)
    raise TypeError(
        f"No torch-format exporter for {type(module).__name__} — "
        "export_module covers the native encoder families "
        "(VisionTransformer, TextTransformer, BertTextEncoder, "
        "VisionTransformerPredictor)"
    )


def export_flax_generic(params: Mapping[str, Any]) -> dict:
    """Arbitrary Flax param tree → torch-convention flat state dict: dotted
    paths, ``kernel`` → transposed ``weight``, ``scale``/``embedding`` →
    ``weight``. For trees with no canonical torch model (projection heads,
    postprocessors) — consumers rebuild the matching torch modules by
    shape."""
    out: dict[str, np.ndarray] = {}

    def walk(tree: Mapping[str, Any], prefix: str) -> None:
        for key, val in tree.items():
            name = f"{prefix}.{key}" if prefix else str(key)
            if isinstance(val, Mapping):
                walk(val, name)
                continue
            arr = _np(val)
            if key == "kernel":
                out[f"{prefix}.weight" if prefix else "weight"] = (
                    arr.T if arr.ndim == 2 else arr
                )
            elif key in ("scale", "embedding"):
                out[f"{prefix}.weight" if prefix else "weight"] = arr
            else:
                out[name] = arr

    walk(params, "")
    return out


def _proj_slot(module: Any) -> Optional[str]:
    """Whether this tower's export format has a projection slot, and what it
    can carry: HF CLIP projections are bias-free; a timm ``head`` takes
    kernel+bias; BERT / I-JEPA formats have none."""
    from mmlearn_tpu.modules.encoders.text import TextTransformer
    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    if isinstance(module, TextTransformer):
        return "kernel_only"
    if isinstance(module, VisionTransformer):
        if module.pre_norm:
            return "kernel_only"
        if module.use_cls_token:
            return "kernel_bias"
    return None


def export_task(
    task: Any,
    params: Mapping[str, Any],
    extras: Optional[Mapping[str, Any]] = None,
    skip_unknown: bool = False,
) -> dict:
    """Every exportable tower of a task → ``{name: torch state dict}``.

    - ``ContrastivePretraining``: one entry per encoder key (LoRA deltas
      merged via :func:`mmlearn_tpu.peft.apply_lora` when present) plus a
      ``logit_scale`` entry holding the learned log scale (HF CLIP form).
      A single-``Dense`` projection head folds into its tower's projection
      slot (``visual_projection``/``text_projection``/timm ``head``) so the
      exported model computes the task's actual embeddings; heads that
      can't fold (MLPs, shared across towers, bias into a bias-free CLIP
      slot) and parameterized postprocessors export as separate
      ``heads.<key>`` / ``postprocessors.<key>`` entries (generic torch
      naming) with a warning — they are NOT part of the tower dicts.
    - ``IJEPA``: ``encoder`` / ``predictor`` (reference I-JEPA naming) and,
      when EMA extras are given, ``target_encoder``.
    """
    import logging

    log = logging.getLogger(__name__)
    out: dict[str, dict] = {}
    if hasattr(task, "encoders") and isinstance(task.encoders, Mapping):
        # which head key feeds each encoder (via the modality wiring)
        enc_heads: dict[str, set] = {}
        for m in getattr(task, "modalities", []):
            ek = task.encoder_keys[m] if hasattr(task, "encoder_keys") else m
            hk = task.head_keys[m] if hasattr(task, "head_keys") else m
            if hk in (getattr(task, "heads", None) or {}):
                enc_heads.setdefault(ek, set()).add(hk)
        head_params = dict(params.get("heads") or {})
        merged_heads: set = set()

        for key, module in task.encoders.items():
            enc_params = params["encoders"][key]
            lora = params.get("lora", {})
            if key in lora:
                from mmlearn_tpu.peft import apply_lora

                enc_params = apply_lora(
                    enc_params, lora[key], task.peft_configs[key]
                )
            hks = enc_heads.get(key, set())
            slot = _proj_slot(module)
            if len(hks) == 1 and slot and "proj" not in enc_params:
                hp = head_params.get(next(iter(hks)))
                dense_like = isinstance(hp, Mapping) and set(hp) <= {
                    "kernel", "bias",
                } and "kernel" in hp and np.ndim(hp["kernel"]) == 2
                if dense_like and ("bias" not in hp or slot == "kernel_bias"):
                    # fold the projection head into the tower's slot
                    enc_params = {**enc_params, "proj": hp}
                    merged_heads.add(next(iter(hks)))
            try:
                out[str(key)] = export_module(module, enc_params)
            except (TypeError, ValueError):
                if not skip_unknown:
                    raise
                log.warning(
                    "Skipping encoder %r (%s): no torch-format exporter",
                    key, type(module).__name__,
                )
        for hk, hp in head_params.items():
            if hk in merged_heads or not hp:
                continue
            log.warning(
                "Projection head %r cannot fold into a tower's projection "
                "slot — exported separately as 'heads.%s' (apply it after "
                "the tower in torch)", hk, hk,
            )
            out[f"heads.{hk}"] = export_flax_generic(hp)
        for pk, pp in dict(params.get("postprocessors") or {}).items():
            if not pp:
                continue
            log.warning(
                "Postprocessor %r has parameters with no torch-side naming "
                "— exported separately as 'postprocessors.%s'", pk, pk,
            )
            out[f"postprocessors.{pk}"] = export_flax_generic(pp)
        if "log_logit_scale" in params:
            out["logit_scale"] = {
                "logit_scale": np.asarray(
                    float(np.asarray(params["log_logit_scale"])), np.float32
                )
            }
        return out
    if hasattr(task, "predictor") and hasattr(task, "encoder"):
        out["encoder"] = export_module(task.encoder, params["encoder"])
        out["predictor"] = export_module(task.predictor, params["predictor"])
        if extras and "ema_encoder" in extras:
            out["target_encoder"] = export_module(
                task.encoder, extras["ema_encoder"]
            )
        return out
    raise TypeError(
        f"export_task supports ContrastivePretraining- and IJEPA-shaped "
        f"tasks, got {type(task).__name__}"
    )
