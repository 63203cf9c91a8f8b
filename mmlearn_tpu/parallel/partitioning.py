"""Name-based parameter partitioning rules (dp / fsdp / tp).

Maps each parameter's tree path to a :class:`~jax.sharding.PartitionSpec`.
Defaults implement the standard transformer layout from the scaling-book
recipe: attention/MLP "up" matrices sharded ``(fsdp, model)`` column-wise,
"down"/output matrices ``(model, fsdp)`` row-wise, everything else sharded on
``fsdp`` along its largest divisible dim, small params replicated. On a mesh
with ``fsdp=model=1`` every spec collapses to fully replicated — pure DP,
which is the reference's only strategy (SURVEY.md §2.8).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmlearn_tpu.parallel.mesh import FSDP_AXIS, MODEL_AXIS

# (path regex, ndim, spec) — first match wins. Paths are '/'-joined,
# lowercase tree keys, e.g. 'encoder/blocks_0/attn/qkv/kernel'. The ndim-3
# variants cover nn.scan-stacked block params (leading depth axis).
DEFAULT_RULES: tuple[tuple[str, int, P], ...] = (
    # attention projections
    (r".*/(attn|attention)/(query|key|value|qkv)/kernel$", 2, P(FSDP_AXIS, MODEL_AXIS)),
    (r".*/(attn|attention)/(out|proj|out_proj)/kernel$", 2, P(MODEL_AXIS, FSDP_AXIS)),
    (r".*/(attn|attention)/(query|key|value|qkv)/kernel$", 3,
     P(None, FSDP_AXIS, MODEL_AXIS)),
    (r".*/(attn|attention)/(out|proj|out_proj)/kernel$", 3,
     P(None, MODEL_AXIS, FSDP_AXIS)),
    # MLP
    (r".*/mlp/(fc1|up|gate|linear_0)/kernel$", 2, P(FSDP_AXIS, MODEL_AXIS)),
    (r".*/mlp/(fc2|down|linear_1)/kernel$", 2, P(MODEL_AXIS, FSDP_AXIS)),
    (r".*/mlp/(fc1|up|gate|linear_0)/kernel$", 3, P(None, FSDP_AXIS, MODEL_AXIS)),
    (r".*/mlp/(fc2|down|linear_1)/kernel$", 3, P(None, MODEL_AXIS, FSDP_AXIS)),
    # token / patch embeddings: shard the model dim on fsdp only
    (r".*embed.*/kernel$", 2, P(None, FSDP_AXIS)),
    (r".*embedding$", 2, P(None, FSDP_AXIS)),
)


def _axis_size(mesh: Mesh, axes: Any) -> int:
    if axes is None:
        return 1
    axes = (axes,) if isinstance(axes, str) else axes
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    return size


def _spec_fits(shape: tuple, spec: P, mesh: Mesh) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, axes in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if dim % _axis_size(mesh, axes) != 0:
            return False
    return True


def _fallback_spec(shape: tuple, mesh: Mesh) -> P:
    """Shard the largest dim divisible by the fsdp axis; else replicate."""
    fsdp = mesh.shape[FSDP_AXIS]
    if fsdp == 1 or len(shape) == 0:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for dim_idx in order:
        if shape[dim_idx] % fsdp == 0 and shape[dim_idx] >= fsdp:
            spec = [None] * len(shape)
            spec[dim_idx] = FSDP_AXIS
            return P(*spec)
    return P()


def infer_param_specs(
    params: Any,
    mesh: Mesh,
    rules: Sequence[tuple[str, int, P]] = DEFAULT_RULES,
    min_shard_size: int = 2**14,
) -> Any:
    """Return a pytree of PartitionSpecs matching ``params``' structure."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))).lower() for p in path
        )
        shape = np.shape(leaf)
        chosen: Optional[P] = None
        for pattern, ndim, spec in rules:
            if len(shape) == ndim and re.match(pattern, "/" + key):
                if _spec_fits(shape, spec, mesh):
                    chosen = spec
                break
        if chosen is None:
            if int(np.prod(shape)) >= min_shard_size:
                chosen = _fallback_spec(shape, mesh)
            else:
                chosen = P()
        specs[key] = chosen

    def _lookup(path, leaf):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))).lower() for p in path
        )
        return specs[key]

    return jax.tree_util.tree_map_with_path(_lookup, params)


def shard_params(params: Any, mesh: Mesh, specs: Any = None) -> tuple[Any, Any]:
    """Device-put params with inferred (or given) shardings; returns (params, specs)."""
    if specs is None:
        specs = infer_param_specs(params, mesh)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    params = jax.tree.map(jax.device_put, params, shardings)
    return params, specs


def param_shardings(specs: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
