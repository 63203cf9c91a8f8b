"""Analytic matmul/conv FLOPs of a train step, from its jaxpr.

Replaces XLA's ``compiled.cost_analysis()["flops"]`` for MFU accounting:
that counter reads the optimized HLO, where a ``lax.scan`` body is counted
ONCE regardless of trip count (measured on TPU: a 12-iteration scanned
matmul reports 1/12 the flops of the unrolled loop) and Pallas kernels are
opaque custom-calls counted as zero — so every ``scan_blocks=True`` tower
under-reported by ~depth×. This walker counts the *traced* computation
instead:

- ``dot_general`` / ``conv_general_dilated``: 2·M·N·K-style MAC flops
  (elementwise ops are ignored, per the usual MFU convention);
- ``scan``: body flops × trip count;
- ``pallas_call``: kernel-body flops × grid size (so in-kernel matmuls,
  e.g. the fused-MHA kernels, are counted);
- ``remat``/``pjit``/``custom_vjp`` etc.: recursed into, so rematerialized
  recompute in the differentiated jaxpr IS included — flops/elapsed is
  achieved hardware FLOP/s (HFU-style), matching what the chip executes;
- ``while``: body counted once (trip count is dynamic); ``cond``: the
  most expensive branch.

Counts are GLOBAL (the logical computation): under SPMD, divide by the
mesh size for per-device figures, or compare against ``peak × n_devices``.
"""

from __future__ import annotations

from math import prod
from typing import Any

import jax

__all__ = ["jaxpr_flops", "step_flops"]


def _dot_flops(eqn: Any) -> float:
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = prod(lhs.shape[i] for i in lb)
    k = prod(lhs.shape[i] for i in lc)
    m = prod(
        lhs.shape[i]
        for i in range(len(lhs.shape))
        if i not in set(lb) | set(lc)
    )
    n = prod(
        rhs.shape[i]
        for i in range(len(rhs.shape))
        if i not in set(rb) | set(rc)
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn: Any) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    kernel_spatial = prod(rhs.shape[i] for i in dn.rhs_spec[2:])
    cin_per_group = rhs.shape[dn.rhs_spec[1]]
    return 2.0 * prod(out.shape) * cin_per_group * kernel_spatial


def _inner(closed: Any) -> Any:
    return getattr(closed, "jaxpr", closed)


def _static_grid(grid_mapping: Any) -> int:
    grid = getattr(grid_mapping, "grid", ()) or ()
    n = 1
    for g in grid:
        if isinstance(g, int):
            n *= g
    return max(n, 1)


def jaxpr_flops(jaxpr: Any) -> float:
    """Matmul/conv FLOPs of one jaxpr, recursing through control flow."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += float(eqn.params["length"]) * jaxpr_flops(
                _inner(eqn.params["jaxpr"])
            )
        elif name == "while":
            total += jaxpr_flops(_inner(eqn.params["body_jaxpr"]))
        elif name == "cond":
            total += max(
                (jaxpr_flops(_inner(b)) for b in eqn.params["branches"]),
                default=0.0,
            )
        elif name == "pallas_call":
            kernel = eqn.params.get("jaxpr")
            if kernel is not None:
                total += _static_grid(
                    eqn.params.get("grid_mapping")
                ) * jaxpr_flops(_inner(kernel))
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += jaxpr_flops(_inner(sub))
                    break
    return total


def step_flops(fn: Any, *args: Any) -> float:
    """GLOBAL analytic FLOPs of one call of ``fn(*args)`` (trace-only; no
    compile, so this is cheap even for models whose unrolled XLA compile
    takes minutes)."""
    closed = jax.make_jaxpr(fn)(*args)
    return jaxpr_flops(closed.jaxpr)
