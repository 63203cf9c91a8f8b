"""Parameter-efficient fine-tuning: LoRA + layer freezing, JAX-native.

Capability parity with the reference's PEFT integration
(/root/reference/mmlearn/hf_utils.py:80-94 ``_wrap_peft_model`` and the
``peft_config``/``freeze_layers`` args on every encoder wrapper,
text.py:91-141). Instead of wrapping torch modules, LoRA is a **param-tree
transformation**:

- :func:`init_lora_params` creates ``{"a": (in, r), "b": (r, out)}`` factors
  for every 2-D kernel whose path matches ``target_patterns``;
- :func:`apply_lora` merges ``W = W0 + (a @ b) * alpha / r`` on the fly
  inside the jitted step (one extra small matmul per target, fused by XLA);
- the base tree is frozen through an optax mask (built by
  ``ContrastivePretraining._trainable_mask`` from these factors), so
  optimizer state exists only for the LoRA factors — the JAX equivalent of
  ``requires_grad=False``.

:func:`freeze_layers_mask` reproduces the reference's bool/int/float/list
freeze specs (text.py:91-138).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store

DEFAULT_TARGETS = (r".*attn/qkv$", r".*attn/proj$")


@store(group="modules/peft", name="LoRAConfig", populate_full_signature=False)
@dataclass(frozen=True)
class LoRAConfig:
    """LoRA hyperparameters (mirrors peft.LoraConfig's core fields).

    ``qkv_slices`` expresses the reference's per-projection LoRA targets
    (peft ``target_modules=["query", "value"]``, as in the BIOSCAN configs,
    /root/reference/projects/bioscan_clip/configs/__init__.py:24-64) on our
    FUSED head-interleaved qkv kernels: matched ``*/attn/qkv`` kernels get
    one independent rank-``r`` factor pair per listed slice ("q"/"k"/"v"),
    and the merged delta is assembled in ``[Wq|Wk|Wv]`` packing then
    head-interleaved — numerically identical to LoRA on the separate torch
    projections. Requires ``qkv_num_heads`` (the packing permutation).
    """

    r: int = 8
    lora_alpha: float = 16.0
    target_patterns: tuple[str, ...] = DEFAULT_TARGETS
    lora_dropout: float = 0.0  # accepted for parity; merge-time LoRA skips it
    qkv_slices: tuple[str, ...] = ()
    qkv_num_heads: int = 0
    #: peft ``modules_to_save`` parity: path patterns (``re.search``) whose
    #: params stay TRAINABLE alongside the LoRA factors (e.g. "decoder" for
    #: BarcodeBERT's replaced MLM head — reference BIOSCAN configs)
    modules_to_save: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.qkv_slices:
            bad = set(self.qkv_slices) - {"q", "k", "v"}
            if bad:
                raise ValueError(f"qkv_slices must be among q/k/v, got {bad}")
            if self.qkv_num_heads <= 0:
                raise ValueError(
                    "qkv_slices requires qkv_num_heads (the fused kernel's "
                    "head-interleaved packing)"
                )

    @property
    def scaling(self) -> float:
        return self.lora_alpha / self.r


def _path_str(path: tuple) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _match_kernel(path: tuple, leaf: Any, patterns: Sequence[str]) -> bool:
    key = _path_str(path)
    if not key.endswith("/kernel"):
        return False
    parent = key[: -len("/kernel")]
    # ndim 2 = plain Dense kernel; ndim 3 = nn.scan-stacked (depth, in, out)
    return np.ndim(leaf) in (2, 3) and any(re.match(p, parent) for p in patterns)


def init_lora_params(
    params: Any, config: LoRAConfig, rng: jax.Array
) -> dict[str, dict[str, jnp.ndarray]]:
    """Create LoRA factors for every matching kernel.

    Returns a flat dict ``{parent_path: {"a": ..., "b": ...}}``; ``a`` is
    kaiming-initialized, ``b`` zeros (standard LoRA init — merged delta
    starts at 0). Scan-stacked kernels ``(depth, in, out)`` get per-layer
    factors ``(depth, in, r)``/``(depth, r, out)``.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora: dict[str, dict[str, jnp.ndarray]] = {}
    for i, (path, leaf) in enumerate(flat):
        if not _match_kernel(path, leaf, config.target_patterns):
            continue
        parent = _path_str(path)[: -len("/kernel")]
        sub = jax.random.fold_in(rng, i)

        def _factors(key, d_in, d_out, lead=()):
            a = jax.random.normal(key, (*lead, d_in, config.r), jnp.float32)
            return {
                "a": a * (1.0 / np.sqrt(d_in)),
                "b": jnp.zeros((*lead, config.r, d_out), jnp.float32),
            }

        lead = () if np.ndim(leaf) == 2 else np.shape(leaf)[:1]
        d_in, d_out = np.shape(leaf)[-2:]
        if config.qkv_slices and parent.endswith("qkv"):
            # per-slice factors over the [Wq|Wk|Wv] packing (d_out = 3C)
            lora[parent] = {
                s: _factors(jax.random.fold_in(sub, k), d_in, d_out // 3, lead)
                for k, s in enumerate(config.qkv_slices)
            }
        else:
            lora[parent] = _factors(sub, d_in, d_out, lead)
    return lora


def apply_lora(
    base_params: Any,
    lora_params: dict[str, dict[str, jnp.ndarray]],
    config: LoRAConfig,
) -> Any:
    """Merged tree: ``kernel + (a @ b) * scaling`` for LoRA'd layers."""
    if not lora_params:
        return base_params

    def _ab(entry):
        a, b = entry["a"], entry["b"]
        if a.ndim == 3:  # per-layer factors for stacked kernels
            return jnp.einsum("lir,lro->lio", a, b)
        return a @ b

    def _merge(path, leaf):
        key = _path_str(path)
        if key.endswith("/kernel"):
            parent = key[: -len("/kernel")]
            if parent in lora_params:
                entry = lora_params[parent]
                if "a" in entry:
                    ab = _ab(entry)
                else:
                    # per-slice factors: assemble the delta in [Wq|Wk|Wv]
                    # packing, then head-interleave to the fused layout —
                    # identical to LoRA on separate q/k/v projections
                    from mmlearn_tpu.ops.fused_attention import (
                        interleave_qkv_heads,
                    )

                    c = leaf.shape[-1] // 3
                    lead = leaf.shape[:-2] + leaf.shape[-2:-1]
                    zero = jnp.zeros((*lead, c), jnp.float32)
                    ab = interleave_qkv_heads(
                        jnp.concatenate(
                            [
                                _ab(entry[s]) if s in entry else zero
                                for s in ("q", "k", "v")
                            ],
                            axis=-1,
                        ),
                        config.qkv_num_heads,
                    )
                return leaf + (ab * config.scaling).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(_merge, base_params)


def modules_to_save_mask(params: Any, patterns: Sequence[str]) -> Any:
    """Trainability mask for a LoRA'd (otherwise frozen) tower: leaves whose
    path matches any pattern (``re.search``) stay trainable — peft's
    ``modules_to_save`` semantics."""

    def _trainable(path, _):
        key = _path_str(path)
        return any(re.search(p, key) for p in patterns)

    return jax.tree_util.tree_map_with_path(_trainable, params)


def freeze_layers_mask(
    params: Any,
    freeze_spec: Union[bool, int, float, Sequence[int], None],
    block_prefix: str = "blocks_",
    embedding_keys: tuple[str, ...] = (
        "patch_embed",
        "token_embedding",
        "position_embedding",
        "token_type_embedding",
        "pos_embed",
        "cls_token",
        "embed_norm",
    ),
) -> Any:
    """Trainability mask (True = trainable) from a reference-style spec.

    - ``True``: freeze everything; ``False``/``None``: train everything;
    - ``int n``: freeze embeddings + the first n blocks (negative n counts
      from the end, like the reference);
    - ``float f`` in (0, 1]: freeze embeddings + first ``round(f * depth)``;
    - list of ints: freeze exactly those block indices (+ embeddings).

    Reference semantics: /root/reference/mmlearn/modules/encoders/text.py:91-138.
    """
    if freeze_spec is None or freeze_spec is False:
        return jax.tree.map(lambda _: True, params)
    if freeze_spec is True:
        return jax.tree.map(lambda _: False, params)

    depth = 0
    has_stacked = False
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _path_str(path)
        m = re.search(rf"{block_prefix}(\d+)", key)
        if m:
            depth = max(depth, int(m.group(1)) + 1)
        if "block_stack" in key or "/blocks/block/" in f"/{key}/":
            has_stacked = True
    if depth == 0 and has_stacked and not isinstance(freeze_spec, bool):
        raise ValueError(
            "Per-layer freeze specs (int/float/list) require loop-format "
            "blocks; this tree uses nn.scan-stacked params (scan_blocks=True)."
            " Use freeze_spec=True/False, or disable scan_blocks."
        )
    if depth == 0 and not isinstance(freeze_spec, bool):
        # silently freezing nothing would diverge from the requested config
        raise ValueError(
            f"Per-layer freeze spec {freeze_spec!r} found no blocks matching "
            f"prefix {block_prefix!r} in the param tree — pass the encoder's "
            "actual block prefix via block_prefix=..."
        )

    if isinstance(freeze_spec, float):
        n = int(round(freeze_spec * depth))
        frozen_blocks = set(range(n))
    elif isinstance(freeze_spec, int):
        n = freeze_spec if freeze_spec >= 0 else depth + freeze_spec
        frozen_blocks = set(range(n))
    else:
        frozen_blocks = {i if i >= 0 else depth + i for i in freeze_spec}

    def _trainable(path, _):
        key = _path_str(path)
        m = re.search(rf"{block_prefix}(\d+)", key)
        if m:
            return int(m.group(1)) not in frozen_blocks
        head = key.split("/")[0]
        if head in embedding_keys:
            return False
        return True

    return jax.tree_util.tree_map_with_path(_trainable, params)
