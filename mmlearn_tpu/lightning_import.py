"""Import reference (Lightning) checkpoints into this framework.

The reference trains with PyTorch Lightning; its ``ModelCheckpoint`` writes
``.ckpt`` files (torch pickles) holding ``{"state_dict": <task state dict>,
"global_step", "epoch", ...}`` (checkpoint dir wiring: reference
mmlearn/conf/__init__.py:417-426). A user migrating a half-trained reference
run points :func:`import_lightning_checkpoint` at that file and gets back an
*overlay* pytree in our parameter layout plus run metadata; the trainer (or
the ``init_from_lightning`` CLI key) merges the overlay onto freshly
initialized params.

Task layouts handled (detected from the state-dict key prefixes):

- **ContrastivePretraining** (reference tasks/contrastive_pretraining.py:284-334):
  ``encoders.<key>.*`` (each converted by the matching encoder converter
  from :mod:`mmlearn_tpu.hf_utils`, auto-detected per encoder),
  ``heads.<key>.*`` (``nn.Linear`` or the Sequential ``MLP`` from reference
  modules/layers/mlp.py), ``postprocessors.<key>.*``, and the task-level
  ``log_logit_scale`` parameter.
- **IJEPA** (reference tasks/ijepa.py:93-106, EMA persistence :188-215):
  ``encoder.*`` / ``predictor.*`` via the I-JEPA converters. The reference
  does NOT persist teacher weights — ``on_load_checkpoint`` restores the
  teacher FROM the student (``target_encoder.restore(self.encoder)``), and
  only ``{decay, num_updates}`` ride in ``checkpoint["ema_params"]``. We
  reproduce exactly that: the overlay carries student+predictor, and
  re-running ``task.init_extras`` after the merge re-copies the teacher
  from the imported student.

Encoder auto-detection (keys are the *stripped* per-encoder sub-dict):

================================================  =========================
key signature                                     converter
================================================  =========================
``model.text_model.embeddings.token_embedding.*`` convert_clip_text
``model.vision_model.embeddings.patch_embedding`` convert_clip_vision
``model.embeddings.patch_embedding.weight``       convert_clip_vision
  (``HFCLIPVisionEncoder`` stores the unwrapped
  ``model.vision_model`` — reference clip.py:194)
``model.embeddings.word_embeddings.weight``       convert_bert
``model.bert.embeddings.word_embeddings.weight``  convert_bert_mlm
  (BarcodeBERT-style ``BertForMaskedLM`` tower —
  reference projects/bioscan_clip/encoders.py)
``model.patch_embed.proj.weight``                 convert_timm_vit
``patch_embed.proj.weight``                       convert_ijepa_vit
``predictor_embed.weight``                        convert_ijepa_predictor
================================================  =========================

`peft`-wrapped encoders (reference ``_wrap_peft_model``, hf_utils.py:80-94)
are unwrapped before detection: the base tower converts normally (with the
TRAINED ``modules_to_save`` copies), and the LoRA ``A``/``B`` factors land in
``overlay["lora"][<encoder>]`` in :mod:`mmlearn_tpu.peft`'s layout —
per-slice entries for per-projection targets (``["query", "value"]``),
head-interleaved full factors for fused-qkv targets (timm's ``["qkv"]``).
The target task must be built with the matching ``peft_configs`` so
``init_params`` creates the factor slots the overlay fills; per-layer
imported factors re-stack onto ``nn.scan`` towers automatically
(:func:`_stack_lora_entries`).

Blocks come back unstacked (``blocks_0..blocks_{d-1}``);
:func:`overlay_params` re-stacks them when the target tree uses the
``nn.scan`` layout, then validates every leaf shape.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable, Mapping, Optional

import numpy as np

__all__ = [
    "import_lightning_checkpoint",
    "overlay_params",
    "convert_reference_state_dict",
]

logger = logging.getLogger(__name__)


def _load_ckpt(path: str) -> dict:
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # noqa: BLE001 - hyper_parameters need full pickle
        logger.warning(
            "%s: weights_only load failed (checkpoint carries pickled "
            "hyper_parameters); falling back to full unpickling — only load "
            "checkpoints you trust", path,
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def _strip(sd: Mapping[str, Any], prefix: str) -> dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _np(t: Any) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def _count_blocks(sd: Mapping[str, Any], pattern: str) -> int:
    idx = {
        int(m.group(1))
        for k in sd
        for m in [re.match(pattern, k)]
        if m is not None
    }
    return max(idx) + 1 if idx else 0


def _unwrap_peft_state_dict(
    sub: Mapping[str, Any],
) -> tuple[dict, dict[str, dict[str, Any]]]:
    """Undo `peft` wrapping in one encoder's stripped state dict.

    The reference wraps encoders with ``peft.get_peft_model`` (reference
    hf_utils.py:80-94; LoRA configs in
    projects/bioscan_clip/configs/__init__.py:24-64), which rewrites the
    state-dict namespace: a ``base_model.model.`` prefix on the wrapped
    tower, target Linears renamed to ``<mod>.base_layer.*`` with sibling
    ``<mod>.lora_A.default.weight`` / ``<mod>.lora_B.default.weight``
    factors, and ``modules_to_save`` modules duplicated as
    ``<mod>.original_module.*`` (frozen) + ``<mod>.modules_to_save.default.*``
    (trained). Returns ``(clean_sd, lora_raw)``: ``clean_sd`` uses the
    unwrapped module names (with the TRAINED copy of modules_to_save), and
    ``lora_raw`` maps each target module's clean path to its
    ``{"A": (r, in), "B": (out, r)}`` tensors.
    """
    clean: dict[str, Any] = {}
    lora: dict[str, dict[str, Any]] = {}
    for key, value in sub.items():
        key = key.replace("base_model.model.", "", 1)
        if ".original_module." in key or key.startswith("original_module."):
            continue
        key = key.replace(".modules_to_save.default", "").replace(
            "modules_to_save.default.", ""
        )
        m = re.match(r"(.*)\.lora_([AB])\.[^.]+\.weight$", key)
        if m is not None:
            lora.setdefault(m.group(1), {})[m.group(2)] = value
            continue
        if ".lora_" in key:  # e.g. lora embedding / dora variants
            raise ValueError(f"unsupported peft parameter {key!r}")
        key = key.replace(".base_layer.", ".")
        clean[key] = value
    return clean, lora


def _is_peft_state_dict(sub: Mapping[str, Any]) -> bool:
    return any(
        "base_model.model." in k or ".lora_A." in k or ".lora_B." in k
        for k in sub
    )


#: torch attention-projection module name → fused-qkv slice letter
_QKV_SLICES = {
    "query": "q", "key": "k", "value": "v",
    "q_proj": "q", "k_proj": "k", "v_proj": "v",
}

#: per converter family: (regex over the torch module path → our parent path
#: template). ``{i}`` is the block index; a ``slice`` group marks a
#: per-projection LoRA target on our fused qkv kernel.
_LORA_PATH_TABLES: dict[str, list[tuple[str, str]]] = {
    "bert": [
        (r"model\.encoder\.layer\.(?P<i>\d+)\.attention\.self\.(?P<slice>query|key|value)$",
         "blocks_{i}/attn/qkv"),
        (r"model\.encoder\.layer\.(?P<i>\d+)\.attention\.output\.dense$",
         "blocks_{i}/attn/proj"),
        (r"model\.encoder\.layer\.(?P<i>\d+)\.intermediate\.dense$",
         "blocks_{i}/mlp/fc1"),
        (r"model\.encoder\.layer\.(?P<i>\d+)\.output\.dense$",
         "blocks_{i}/mlp/fc2"),
    ],
    "bert_mlm": [
        (r"model\.bert\.encoder\.layer\.(?P<i>\d+)\.attention\.self\.(?P<slice>query|key|value)$",
         "bert/blocks_{i}/attn/qkv"),
        (r"model\.bert\.encoder\.layer\.(?P<i>\d+)\.attention\.output\.dense$",
         "bert/blocks_{i}/attn/proj"),
        (r"model\.bert\.encoder\.layer\.(?P<i>\d+)\.intermediate\.dense$",
         "bert/blocks_{i}/mlp/fc1"),
        (r"model\.bert\.encoder\.layer\.(?P<i>\d+)\.output\.dense$",
         "bert/blocks_{i}/mlp/fc2"),
    ],
    "timm_vit": [
        (r"model\.blocks\.(?P<i>\d+)\.attn\.qkv$", "blocks_{i}/attn/qkv"),
        (r"model\.blocks\.(?P<i>\d+)\.attn\.proj$", "blocks_{i}/attn/proj"),
        (r"model\.blocks\.(?P<i>\d+)\.mlp\.fc1$", "blocks_{i}/mlp/fc1"),
        (r"model\.blocks\.(?P<i>\d+)\.mlp\.fc2$", "blocks_{i}/mlp/fc2"),
    ],
    "clip_text": [
        (r"model\.(?:text_model\.)?encoder\.layers\.(?P<i>\d+)\.self_attn\.(?P<slice>q_proj|k_proj|v_proj)$",
         "blocks_{i}/attn/qkv"),
        (r"model\.(?:text_model\.)?encoder\.layers\.(?P<i>\d+)\.self_attn\.out_proj$",
         "blocks_{i}/attn/proj"),
        (r"model\.(?:text_model\.)?encoder\.layers\.(?P<i>\d+)\.mlp\.fc1$",
         "blocks_{i}/mlp/fc1"),
        (r"model\.(?:text_model\.)?encoder\.layers\.(?P<i>\d+)\.mlp\.fc2$",
         "blocks_{i}/mlp/fc2"),
    ],
}
_LORA_PATH_TABLES["clip_vision"] = [
    (pat.replace("text_model", "vision_model"), tmpl)
    for pat, tmpl in _LORA_PATH_TABLES["clip_text"]
]


def _convert_lora_factors(
    family: str,
    lora_raw: Mapping[str, Mapping[str, Any]],
    num_heads: Optional[int],
) -> dict:
    """peft LoRA factors → our ``params["lora"][<encoder>]`` layout.

    torch LoRA adds ``B @ A`` to the (out, in) weight, i.e. ``A.T @ B.T``
    to our (in, out) kernel — so ``a = A.T``, ``b = B.T``
    (mmlearn_tpu.peft.apply_lora merges ``a @ b``; scaling ``alpha/r`` is
    applied at merge time on both sides, so factors travel unscaled).
    Per-projection targets (peft ``target_modules=["query", "value"]``)
    become slice entries on our fused qkv kernel; a fused-qkv target (timm's
    ``["qkv"]``) needs its ``b`` head-interleaved exactly like the base
    kernel conversion.
    """
    table = _LORA_PATH_TABLES.get(family)
    if table is None:
        raise ValueError(
            f"LoRA import not supported for encoder family {family!r}"
        )
    out: dict[str, dict] = {}
    for mod_path, ab in lora_raw.items():
        if set(ab) != {"A", "B"}:
            raise ValueError(
                f"incomplete LoRA factor pair for {mod_path!r}: {sorted(ab)}"
            )
        for pattern, template in table:
            m = re.match(pattern, mod_path)
            if m is None:
                continue
            parent = template.format(i=m.group("i"))
            a = _np(ab["A"]).T
            b = _np(ab["B"]).T
            slice_name = m.groupdict().get("slice")
            if slice_name is not None:
                out.setdefault(parent, {})[_QKV_SLICES[slice_name]] = {
                    "a": a, "b": b,
                }
            elif parent.endswith("/attn/qkv"):
                if num_heads is None:
                    raise ValueError(
                        "fused-qkv LoRA import needs num_heads (the fused "
                        "kernel's head-interleaved packing)"
                    )
                from mmlearn_tpu.ops.fused_attention import (
                    interleave_qkv_heads,
                )

                out[parent] = {
                    "a": a, "b": interleave_qkv_heads(b, num_heads),
                }
            else:
                out[parent] = {"a": a, "b": b}
            break
        else:
            raise ValueError(
                f"no LoRA path mapping for module {mod_path!r} "
                f"(family {family!r})"
            )
    return out


def _detect_encoder_converter(
    sub: Mapping[str, Any],
    num_heads: Optional[int] = None,
) -> tuple[str, Callable[[Mapping[str, Any]], dict]]:
    """Pick the hf_utils converter for one encoder's stripped state dict.

    ``num_heads`` overrides head-count inference (HF checkpoints don't
    carry it in the state dict; the standard-width tables cover released
    models, tiny test towers must pass it)."""
    from mmlearn_tpu import hf_utils as H

    if "model.text_model.embeddings.token_embedding.weight" in sub:
        depth = _count_blocks(sub, r"model\.text_model\.encoder\.layers\.(\d+)\.")
        return "clip_text", lambda sd: H.convert_clip_text(
            sd, depth, prefix="model.text_model",
            projection_key="model.text_projection.weight",
            num_heads=num_heads,
        )
    if "model.vision_model.embeddings.patch_embedding.weight" in sub:
        depth = _count_blocks(sub, r"model\.vision_model\.encoder\.layers\.(\d+)\.")
        return "clip_vision", lambda sd: H.convert_clip_vision(
            sd, depth, prefix="model.vision_model",
            projection_key="model.visual_projection.weight",
            num_heads=num_heads,
        )
    if "model.embeddings.token_embedding.weight" in sub:
        # HFCLIPTextEncoder stores the bare CLIPTextTransformer
        depth = _count_blocks(sub, r"model\.encoder\.layers\.(\d+)\.")
        return "clip_text", lambda sd: H.convert_clip_text(
            sd, depth, prefix="model", projection_key=None,
            num_heads=num_heads,
        )
    if "model.embeddings.patch_embedding.weight" in sub:
        # HFCLIPVisionEncoder stores model.vision_model (reference clip.py:194)
        depth = _count_blocks(sub, r"model\.encoder\.layers\.(\d+)\.")
        return "clip_vision", lambda sd: H.convert_clip_vision(
            sd, depth, prefix="model", projection_key=None,
            num_heads=num_heads,
        )
    if "model.bert.embeddings.word_embeddings.weight" in sub:
        # BarcodeBERT-style BertForMaskedLM tower (reference
        # projects/bioscan_clip/encoders.py:14-95 stores the full MLM model)
        depth = _count_blocks(sub, r"model\.bert\.encoder\.layer\.(\d+)\.")
        return "bert_mlm", lambda sd: H.convert_bert_mlm(
            sd, depth, prefix="model", num_heads=num_heads
        )
    if "model.embeddings.word_embeddings.weight" in sub:
        depth = _count_blocks(sub, r"model\.encoder\.layer\.(\d+)\.")
        return "bert", lambda sd: H.convert_bert(
            sd, depth, prefix="model", num_heads=num_heads
        )
    if "model.patch_embed.proj.weight" in sub:
        return "timm_vit", lambda sd: H.convert_timm_vit(
            {k[len("model."):]: v for k, v in sd.items()},
            num_heads=num_heads,
        )
    if "patch_embed.proj.weight" in sub:
        depth = _count_blocks(sub, r"blocks\.(\d+)\.")
        dim = _np(sub["patch_embed.proj.weight"]).shape[0]
        heads = num_heads or {384: 6, 768: 12, 1024: 16, 1280: 16}.get(
            dim, max(dim // 64, 1)
        )
        return "ijepa_vit", lambda sd: H.convert_ijepa_vit(sd, depth, heads)
    if "predictor_embed.weight" in sub:
        depth = _count_blocks(sub, r"predictor_blocks\.(\d+)\.")
        dim = _np(sub["predictor_embed.weight"]).shape[0]
        heads = num_heads or {384: 6, 768: 12}.get(dim, max(dim // 32, 1))
        return "ijepa_predictor", lambda sd: H.convert_ijepa_predictor(
            sd, depth, heads
        )
    raise ValueError(
        "unrecognized encoder state dict (no converter matches); keys "
        f"start with: {sorted(sub)[:6]}"
    )


def _convert_sequential_head(sub: Mapping[str, Any]) -> dict:
    """Reference head → our :class:`~mmlearn_tpu.modules.layers.mlp.MLP`
    params. A bare ``nn.Linear`` converts to ``{fc1: {kernel, bias}}``
    (our single-layer ``MLP(out_dim=...)`` — the canonical head module);
    the Sequential ``MLP`` (reference modules/layers/mlp.py:10, numeric
    child keys) → ``{fc1.., norm1..}``."""
    if "weight" in sub:  # bare nn.Linear → single-layer MLP
        out = {"kernel": _np(sub["weight"]).T}
        if "bias" in sub:
            out["bias"] = _np(sub["bias"])
        return {"fc1": out}
    if not any(re.match(r"\d+\.", k) for k in sub):
        # not a Sequential: a leaf-parameter module (e.g. the reference's
        # LearnableLogitScaling postprocessor, whose `log_logit_scale`
        # param name matches ours) — pass the leaves through
        return {k: _np(v) for k, v in sub.items()}
    children: dict[int, dict] = {}
    for k, v in sub.items():
        m = re.match(r"(\d+)\.(weight|bias)$", k)
        if not m:
            raise ValueError(f"unrecognized head param {k!r}")
        children.setdefault(int(m.group(1)), {})[m.group(2)] = _np(v)
    params: dict[str, Any] = {}
    n_fc = n_norm = 0
    for idx in sorted(children):
        child = children[idx]
        if child["weight"].ndim == 2:  # Linear
            n_fc += 1
            entry = {"kernel": child["weight"].T}
            if "bias" in child:
                entry["bias"] = child["bias"]
            params[f"fc{n_fc}"] = entry
        else:  # LayerNorm / BatchNorm-style 1-D affine
            n_norm += 1
            params[f"norm{n_norm}"] = {
                "scale": child["weight"],
                "bias": child["bias"],
            }
    return params


def convert_reference_state_dict(
    state_dict: Mapping[str, Any],
    converters: Optional[Mapping[str, Callable[[Mapping[str, Any]], dict]]] = None,
    num_heads: Any = None,
) -> dict:
    """Reference task ``state_dict`` → overlay pytree in our layout.

    ``converters`` optionally overrides the auto-detected encoder converter
    per encoder key (signature: stripped sub state dict → params tree).
    ``num_heads``: int (all encoders) or ``{encoder_key: int}`` — overrides
    head-count inference for non-standard widths.
    """

    def _heads_for(key: str) -> Optional[int]:
        if isinstance(num_heads, Mapping):
            return num_heads.get(key)
        return num_heads
    sd = dict(state_dict)
    overlay: dict[str, Any] = {}
    top = {k.split(".", 1)[0] for k in sd if "." in k}

    if "encoders" in top:  # ContrastivePretraining layout
        enc_keys = {k.split(".")[1] for k in sd if k.startswith("encoders.")}
        overlay["encoders"] = {}
        lora_overlay: dict[str, dict] = {}
        for key in sorted(enc_keys):
            sub = _strip(sd, f"encoders.{key}.")
            lora_raw: dict[str, dict[str, Any]] = {}
            if _is_peft_state_dict(sub):
                sub, lora_raw = _unwrap_peft_state_dict(sub)
            conv = (converters or {}).get(key)
            if conv is None:
                name, conv = _detect_encoder_converter(sub, _heads_for(key))
                logger.info("encoders.%s: converting as %s", key, name)
            elif lora_raw:
                name, _ = _detect_encoder_converter(sub, _heads_for(key))
            overlay["encoders"][key] = conv(sub)
            if lora_raw:
                lora_overlay[key] = _convert_lora_factors(
                    name, lora_raw, _heads_for(key)
                )
        if lora_overlay:
            overlay["lora"] = lora_overlay
        head_keys = {k.split(".")[1] for k in sd if k.startswith("heads.")}
        if head_keys:
            overlay["heads"] = {
                key: _convert_sequential_head(_strip(sd, f"heads.{key}."))
                for key in sorted(head_keys)
            }
        post_keys = {
            k.split(".")[1] for k in sd if k.startswith("postprocessors.")
        }
        if post_keys:
            overlay["postprocessors"] = {
                key: _convert_sequential_head(
                    _strip(sd, f"postprocessors.{key}.")
                )
                for key in sorted(post_keys)
            }
        if "log_logit_scale" in sd:
            overlay["log_logit_scale"] = _np(sd["log_logit_scale"]).reshape(())
        return overlay

    if "encoder" in top or "predictor" in top:  # IJEPA layout
        enc = _strip(sd, "encoder.")
        if enc:
            _, conv = _detect_encoder_converter(enc, _heads_for("encoder"))
            overlay["encoder"] = conv(enc)
        pred = _strip(sd, "predictor.")
        if pred:
            _, conv = _detect_encoder_converter(pred, _heads_for("predictor"))
            overlay["predictor"] = conv(pred)
        return overlay

    raise ValueError(
        f"unrecognized reference task state dict (top-level keys: {sorted(top)})"
    )


def import_lightning_checkpoint(
    path: str,
    converters: Optional[Mapping[str, Callable]] = None,
    num_heads: Any = None,
) -> tuple[dict, dict]:
    """Load a reference Lightning ``.ckpt`` → ``(overlay, meta)``.

    ``overlay`` is a pytree in our parameter layout (blocks unstacked —
    pass through :func:`overlay_params` to land it on an initialized tree).
    ``meta``: ``global_step``, ``epoch``, and (I-JEPA) ``ema`` =
    ``{decay, num_updates}`` from ``checkpoint["ema_params"]``.
    """
    ckpt = _load_ckpt(path)
    sd = ckpt.get("state_dict", ckpt)
    overlay = convert_reference_state_dict(
        sd, converters=converters, num_heads=num_heads
    )
    meta = {
        "global_step": int(ckpt.get("global_step", 0)),
        "epoch": int(ckpt.get("epoch", 0)),
    }
    if "ema_params" in ckpt:
        ema = ckpt["ema_params"]
        meta["ema"] = {
            "decay": float(ema.get("decay", 0.0)),
            "num_updates": int(ema.get("num_updates", 0)),
        }
    return overlay, meta


def _stack_lora_entries(target: Mapping[str, Any], overlay: Mapping[str, Any]) -> dict:
    """Re-key per-layer LoRA factors onto a scan-stacked target layout.

    ``init_lora_params`` on an ``nn.scan`` tower creates ONE factor pair per
    qkv with a leading depth axis, keyed by the stacked path (e.g.
    ``block_stack/blocks/block/attn/qkv`` for our ViT,
    ``bert/blocks/block/attn/qkv`` for BERT trunks). Imported checkpoints
    carry per-layer keys (``blocks_{i}/attn/qkv``); stack them along axis 0
    in layer order. Entries whose keys already match pass through.
    """
    out: dict[str, Any] = {}
    remaining = dict(overlay)

    def _stack(entries: list) -> dict:
        if "a" in entries[0]:
            return {
                "a": np.stack([np.asarray(e["a"]) for e in entries]),
                "b": np.stack([np.asarray(e["b"]) for e in entries]),
            }
        slices = sorted(entries[0])
        return {s: _stack([e[s] for e in entries]) for s in slices}

    for tk, tv in target.items():
        if tk in remaining:
            out[tk] = remaining.pop(tk)
            continue
        if "blocks/block/" not in tk:
            raise ValueError(f"overlay has no LoRA entry for target {tk!r}")
        prefix, suffix = tk.rsplit("blocks/block/", 1)
        # scan container modules (BlockStack wraps its scan in block_stack/)
        if prefix.endswith("block_stack/"):
            prefix = prefix[: -len("block_stack/")]
        leaf = tv
        while isinstance(leaf, Mapping) and "a" not in leaf:
            leaf = next(iter(leaf.values()))
        depth = int(np.shape(leaf["a"])[0])
        entries = []
        for i in range(depth):
            key = f"{prefix}blocks_{i}/{suffix}"
            if key not in remaining:
                raise ValueError(
                    f"overlay LoRA entry {key!r} missing (stacking {tk!r})"
                )
            entries.append(remaining.pop(key))
        out[tk] = _stack(entries)
    if remaining:
        raise ValueError(
            f"overlay LoRA entries not in target: {sorted(remaining)[:4]}"
        )
    return out


def _stack_if_scanned(target: Mapping[str, Any], node: dict) -> dict:
    """Re-pack ``blocks_{i}`` into the target's nn.scan layout if needed."""
    if "blocks_0" not in node or "blocks_0" in target:
        return node
    from mmlearn_tpu.hf_utils import stack_block_params

    depth = _count_blocks(node, r"blocks_(\d+)$")
    for out_path in (("block_stack", "blocks", "block"), ("blocks", "block")):
        probe: Any = target
        for k in out_path:
            probe = probe.get(k) if isinstance(probe, Mapping) else None
            if probe is None:
                break
        if probe is not None:
            return stack_block_params(dict(node), depth, out_path=out_path)
    raise ValueError(
        "overlay has per-layer blocks but the target tree has neither "
        "blocks_0 nor a scan block_stack"
    )


def overlay_params(params: Any, overlay: Any, path: str = "") -> Any:
    """Merge an imported overlay onto an initialized parameter tree.

    Handles scan re-stacking at every subtree, validates leaf shapes, and
    casts to the target leaf dtype. Unknown overlay keys are an error
    (catches layout drift loudly, like ``_merge_pretrained``). Pure host
    work: leaves come back as numpy so a ``device_get`` target tree never
    bounces through the (possibly tunneled) device transport just for
    shape/dtype checks — the caller ``device_put``s the merged tree onto
    its shardings once (trainer/trainer.py ``_init_state``)."""
    if isinstance(overlay, Mapping):
        if not isinstance(params, Mapping):
            raise ValueError(f"overlay has subtree at {path or '/'}; target is a leaf")
        if re.fullmatch(r"/lora/[^/]+", path) and (
            set(overlay) - set(params)
        ):
            # per-encoder LoRA factor dict whose keys don't line up: the
            # target tower is scan-stacked, the import is per-layer
            overlay = _stack_lora_entries(params, overlay)
        else:
            overlay = _stack_if_scanned(params, dict(overlay))
        out = dict(params)
        for k, v in overlay.items():
            if k not in params:
                raise ValueError(f"overlay param {path}/{k} not in target tree")
            out[k] = overlay_params(params[k], v, f"{path}/{k}")
        return out
    target_shape = tuple(np.shape(params))
    target_dtype = getattr(params, "dtype", None) or np.asarray(params).dtype
    if tuple(np.shape(overlay)) != target_shape:
        raise ValueError(
            f"shape mismatch at {path or '/'}: overlay "
            f"{np.shape(overlay)} vs target {target_shape}"
        )
    return np.asarray(overlay, dtype=target_dtype)
