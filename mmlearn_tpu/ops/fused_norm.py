"""Fused LayerNorm and residual-add + LayerNorm (TPU Pallas).

Motivation (profiled on v5e, CLIP ViT-B/16 train step at 333 ms): the pre-LN
transformer blocks spend ~40 ms/step in HBM-bound elementwise work — the
residual adds and the LayerNorm forward/backward chains that XLA emits as
separate multiply/reduce + broadcast fusions, each re-reading the ``(B, N, C)``
activation from HBM. These kernels collapse the traffic:

- ``fused_layernorm``: one read of ``x``, one write of ``y``; the backward
  recomputes the row statistics from the saved input (no mean/rstd residuals
  through HBM) and produces ``dx`` plus the ``dgamma``/``dbeta`` reductions in
  a single pass over the data.
- ``fused_add_layernorm``: computes ``r = x + branch`` and ``y = LN(r)`` in
  one kernel — the residual stream is written once and never re-read for the
  norm. The backward folds the residual cotangent into the LN backward, again
  one pass.

Replaces the LayerNorm/residual composition of the reference's Block
(/root/reference/mmlearn/modules/layers/transformer_block.py:63-88) on the
TPU path; numerics follow flax ``nn.LayerNorm`` (f32 statistics, output cast
to the activation dtype).

Layout: kernels consume the activation in its native ``(B, N, C)`` shape —
blocking ``G`` samples per grid step with the full ``(N, C)`` plane resident
in VMEM. Merging ``(B, N)`` into one row axis would force a real re-tiling
copy whenever ``N`` is not a sublane multiple (ViT's N=197 is), which showed
up as ~25 ms/step of reshape fusions in the first cut of this kernel — so we
never reshape on the hot path. ``dgamma``/``dbeta`` accumulate across the
sequential grid into a ``(1, C)`` f32 output block.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

# ~6 f32 temporaries of the block must stay well under the 16 MB
# scoped-VMEM limit → cap block elements at 512k (~12 MB of f32 temps).
_BLOCK_ELEMS = 512 * 1024


def _samples_per_step(b: int, n: int, c: int) -> int:
    """Largest power-of-two sample group that divides B and fits VMEM."""
    g = 1
    while b % (g * 2) == 0 and 2 * g * n * c <= _BLOCK_ELEMS and g < 256:
        g *= 2
    return g


def _supported(b: int, n: int, c: int) -> bool:
    return c % 128 == 0 and c <= 8192 and n * c <= _BLOCK_ELEMS


def _use_pallas(b: int, n: int, c: int) -> bool:
    if os.environ.get("MMLEARN_FUSED_LN", "0") != "1":
        return False
    if not _supported(b, n, c):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _canonical3d(x: jax.Array) -> jax.Array:
    """View ``(..., N, C)`` as ``(B, N, C)`` — leading-dim merges/splits are
    free on TPU (the tiled layout only constrains the last two dims)."""
    if x.ndim == 3:
        return x
    if x.ndim > 3:
        return x.reshape(-1, *x.shape[-2:])
    # 2D (M, C): split rows into sample groups (a free split)
    m, c = x.shape
    r = 1024
    while r > 8 and (m % r or r * c > _BLOCK_ELEMS):
        r //= 2
    if m % r:
        r = 1
    return x.reshape(m // r, r, c)


# ---------------------------------------------------------------- reference


def _ln_ref(x2, gamma, beta, eps):
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xhat = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x2.dtype)


def _ln_bwd_ref(x2, gamma, dy2, eps):
    xf = x2.astype(jnp.float32)
    dyf = dy2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    dxhat = dyf * gamma.astype(jnp.float32)
    c1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    c2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - c1 - xhat * c2)
    reduce_axes = tuple(range(x2.ndim - 1))
    dgamma = jnp.sum(dyf * xhat, axis=reduce_axes)
    dbeta = jnp.sum(dyf, axis=reduce_axes)
    return dx.astype(x2.dtype), dgamma, dbeta


# ------------------------------------------------------------------ kernels


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps, add_ref=None, r_ref=None):
    x = x_ref[...]
    if add_ref is not None:
        x = x + add_ref[...]
        r_ref[...] = x
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xhat = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _fwd_add_kernel(x_ref, a_ref, g_ref, b_ref, r_ref, y_ref, *, eps):
    _fwd_kernel(x_ref, g_ref, b_ref, y_ref, eps=eps, add_ref=a_ref,
                r_ref=r_ref)


def _bwd_kernel(
    x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps, dr_ref=None
):
    i = pl.program_id(0)

    xf = x_ref[...].astype(jnp.float32)
    dyf = dy_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    dxhat = dyf * g_ref[0].astype(jnp.float32)
    c1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    c2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - c1 - xhat * c2)
    if dr_ref is not None:
        dx = dx + dr_ref[...].astype(jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    dg = jnp.sum(dyf * xhat, axis=(0, 1))[None]
    db = jnp.sum(dyf, axis=(0, 1))[None]

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = dg
        db_ref[...] = db

    @pl.when(i > 0)
    def _acc():
        dg_ref[...] += dg
        db_ref[...] += db


def _bwd_add_kernel(x_ref, g_ref, dy_ref, dr_in_ref, dx_ref, dg_ref, db_ref,
                    *, eps):
    _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, eps=eps,
                dr_ref=dr_in_ref)


def _blk_spec(g, n, c):
    return pl.BlockSpec((g, n, c), lambda i: (i, 0, 0))


def _param_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0))


def _fwd_pallas(x3, gamma, beta, eps, add3=None, interpret=False):
    b, n, c = x3.shape
    g = _samples_per_step(b, n, c)
    grid = (b // g,)
    g2 = gamma.reshape(1, c)
    b2 = beta.reshape(1, c)
    compiler_params = None
    if _HAS_PLTPU and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    if add3 is None:
        return pl.pallas_call(
            functools.partial(_fwd_kernel, eps=float(eps)),
            grid=grid,
            in_specs=[_blk_spec(g, n, c), _param_spec(c), _param_spec(c)],
            out_specs=_blk_spec(g, n, c),
            out_shape=jax.ShapeDtypeStruct((b, n, c), x3.dtype),
            interpret=interpret,
            compiler_params=compiler_params,
        )(x3, g2, b2)
    return pl.pallas_call(
        functools.partial(_fwd_add_kernel, eps=float(eps)),
        grid=grid,
        in_specs=[_blk_spec(g, n, c), _blk_spec(g, n, c), _param_spec(c),
                  _param_spec(c)],
        out_specs=[_blk_spec(g, n, c), _blk_spec(g, n, c)],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x3.dtype),
            jax.ShapeDtypeStruct((b, n, c), x3.dtype),
        ],
        interpret=interpret,
        compiler_params=compiler_params,
    )(x3, add3, g2, b2)


def _bwd_pallas(x3, gamma, dy3, eps, dr3=None, interpret=False):
    b, n, c = x3.shape
    g = _samples_per_step(b, n, c)
    grid = (b // g,)
    g2 = gamma.reshape(1, c)
    out_specs = [_blk_spec(g, n, c), _param_spec(c), _param_spec(c)]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, c), x3.dtype),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    ]
    compiler_params = None
    if _HAS_PLTPU and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        )
    if dr3 is None:
        dx, dg, db = pl.pallas_call(
            functools.partial(_bwd_kernel, eps=float(eps)),
            grid=grid,
            in_specs=[_blk_spec(g, n, c), _param_spec(c), _blk_spec(g, n, c)],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=compiler_params,
        )(x3, g2, dy3)
    else:
        dx, dg, db = pl.pallas_call(
            functools.partial(_bwd_add_kernel, eps=float(eps)),
            grid=grid,
            in_specs=[_blk_spec(g, n, c), _param_spec(c), _blk_spec(g, n, c),
                      _blk_spec(g, n, c)],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=compiler_params,
        )(x3, g2, dy3, dr3)
    return dx, dg.reshape(c), db.reshape(c)


# ---------------------------------------------------------------- custom_vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layernorm(x3, gamma, beta, eps):
    if not _use_pallas(*x3.shape):
        return _ln_ref(x3, gamma, beta, eps)
    return _fwd_pallas(x3, gamma, beta, eps)


def _layernorm_fwd(x3, gamma, beta, eps):
    return _layernorm(x3, gamma, beta, eps), (x3, gamma)


def _layernorm_bwd(eps, residuals, dy3):
    x3, gamma = residuals
    if not _use_pallas(*x3.shape):
        dx, dg, db = _ln_bwd_ref(x3, gamma, dy3, eps)
    else:
        dx, dg, db = _bwd_pallas(x3, gamma, dy3, eps)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_layernorm.defvjp(_layernorm_fwd, _layernorm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _add_layernorm(x3, a3, gamma, beta, eps):
    if not _use_pallas(*x3.shape):
        r = x3 + a3
        return r, _ln_ref(r, gamma, beta, eps)
    return _fwd_pallas(x3, gamma, beta, eps, add3=a3)


def _add_layernorm_fwd(x3, a3, gamma, beta, eps):
    r, y = _add_layernorm(x3, a3, gamma, beta, eps)
    return (r, y), (r, gamma)


def _add_layernorm_bwd(eps, residuals, cot):
    r, gamma = residuals
    dr_in, dy3 = cot
    if not _use_pallas(*r.shape):
        dx, dg, db = _ln_bwd_ref(r, gamma, dy3, eps)
        dx = (dx.astype(jnp.float32) + dr_in.astype(jnp.float32)).astype(
            r.dtype
        )
    else:
        dx, dg, db = _bwd_pallas(r, gamma, dy3, eps, dr3=dr_in)
    return dx, dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_add_layernorm.defvjp(_add_layernorm_fwd, _add_layernorm_bwd)


# --------------------------------------------------------------- public API


def fused_layernorm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, *, eps: float = 1e-6
) -> jax.Array:
    """LayerNorm over the last axis with f32 statistics (flax semantics).

    Dispatches to the Pallas kernel only when ``MMLEARN_FUSED_LN=1`` (default
    off): measured end-to-end on the flagship remat+scan train step, the
    standalone kernel *loses* to XLA (354 vs 333 ms/step) because XLA fuses
    the LayerNorm recompute into the consuming matmul's operand read — the
    Pallas call replaces free fused recompute with extra HBM passes. The
    kernels remain available for non-remat settings and as the building block
    for a future fully-fused transformer-block kernel.
    """
    x3 = _canonical3d(x)
    if not _use_pallas(*x3.shape):
        return _ln_ref(x, gamma, beta, float(eps))
    return _layernorm(x3, gamma, beta, float(eps)).reshape(x.shape)


def fused_add_layernorm(
    x: jax.Array,
    branch: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """``r = x + branch; y = LN(r)`` in one HBM pass. Returns ``(r, y)``.

    Same dispatch policy as :func:`fused_layernorm` (default: XLA path).
    """
    x3 = _canonical3d(x)
    if not _use_pallas(*x3.shape):
        r = x + branch
        return r, _ln_ref(r, gamma, beta, float(eps))
    r, y = _add_layernorm(
        x3, _canonical3d(branch), gamma, beta, float(eps)
    )
    return r.reshape(x.shape), y.reshape(x.shape)


def fused_layernorm_interpret(x, gamma, beta, *, eps=1e-6):
    """Interpreter-mode forward (CPU correctness tests)."""
    x3 = _canonical3d(x)
    return _fwd_pallas(x3, gamma, beta, float(eps),
                       interpret=True).reshape(x.shape)


def fused_add_layernorm_interpret(x, branch, gamma, beta, *, eps=1e-6):
    x3 = _canonical3d(x)
    r, y = _fwd_pallas(x3, gamma, beta, float(eps),
                       add3=_canonical3d(branch), interpret=True)
    return r.reshape(x.shape), y.reshape(x.shape)


def fused_layernorm_bwd_interpret(x, gamma, dy, *, eps=1e-6, dr=None):
    x3 = _canonical3d(x)
    dr3 = None if dr is None else _canonical3d(dr)
    dx, dg, db = _bwd_pallas(x3, gamma, _canonical3d(dy), float(eps), dr3=dr3,
                             interpret=True)
    return dx.reshape(x.shape), dg, db
