"""Fused int8 quantizing matmul (TPU Pallas).

Why a kernel: the XLA composition of dynamic int8 training
(``modules/layers/quantization.py``) computes absmax → scale → round →
convert → s8 relayout → dot as separate HBM-visible stages; the v5e trace
(round 3: 521 pairs/s vs 769 bf16) shows the round/convert fusions and s8
relayout reshapes eating more than the int8 MXU saves. Division of labor
here (informed by a first probe where in-kernel *weight* quantization
re-ran once per M-block and lost 0.5-0.8x):

- **weights** are quantized once per step in XLA (`quantize_weight` —
  per-column absmax; one elementwise pass over the params, ~0.3 ms for the
  flagship) and passed to the kernel as s8 + f32 scales;
- **activations** are quantized inside the kernel: the ``(bm, K)`` block is
  read once (bf16), row-absmax'ed, scaled and rounded in registers, then
  fed to one s8×s8→s32 MXU matmul — scales and s8 copies never touch HBM;
- the grid iterates ``(m, n)`` with ``n`` innermost so the quantized
  activation block (s8 + scales, VMEM scratch) is reused across the whole
  n sweep.

Numerics are identical to
:func:`mmlearn_tpu.modules.layers.quantization.int8_matmul_ste`'s forward
(same per-row/per-column symmetric absmax).

Used by ``MMLEARN_QUANT=int8_sb`` ("switchback"): forward and dgrad run this
kernel (2/3 of the layer's matmul FLOPs on the int8 MXU path), wgrad stays
bf16 — wgrad's contraction is over tokens, whose exact per-channel scaling
would need an extra full pass over the activations. The reference has no
quantization support at all (its perf surface is TF32/fp16-mixed,
/root/reference/mmlearn/cli/run.py:46-49).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def quantize_weight(w: jax.Array, axis: int = 0):
    """Symmetric absmax int8 quantization of a weight matrix.

    ``axis=0`` (per-column, over the contraction dim) for the forward;
    call on ``w.T`` for the dgrad operand. Delegates to the canonical
    quantizer so the kernel path and the XLA-composed path
    (``modules/layers/quantization.py``) stay numerically identical.
    """
    from mmlearn_tpu.modules.layers.quantization import _quantize

    return _quantize(w, axis)


def _qmm_kernel(x_ref, qw_ref, sw_ref, o_ref, qx_ref, sx_ref):
    """One (bm, K) x (K, bn) tile: s8 MXU dot against cached quantized x.

    The grid runs ``n`` innermost: at ``ni == 0`` the (bm, K) activation
    block is quantized ONCE into s8/scale scratch; all n-blocks of the same
    m-block reuse it (a first version quantized per (m, n) program — 6x
    redundant VPU work at ViT-B fc shapes, measured 0.76-0.86x bf16).
    """
    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _quantize():
        x = x_ref[...].astype(jnp.float32)  # (bm, K)
        sx = jnp.maximum(
            jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-6
        ) / 127.0
        qx_ref[...] = jnp.round(x / sx).astype(jnp.int8)
        sx_ref[...] = sx

    acc = jax.lax.dot_general(
        qx_ref[...], qw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        acc.astype(jnp.float32) * (sx_ref[...] * sw_ref[...])
    ).astype(o_ref.dtype)


def _pad_to(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# full-K blocks keep the per-row scales exact; bound the VMEM footprint
_MAX_K = 8192


def supports_int8_qmm(m: int, k: int, n: int) -> bool:
    """Shapes this kernel handles: K small enough for full-K VMEM blocks."""
    return k <= _MAX_K and m >= 8 and n >= 128


def int8_qmm(
    x: jax.Array,
    qw: jax.Array,
    sw: jax.Array,
    *,
    block_m: int = 256,  # the ni==0 quantize holds a (bm, K) f32 temp
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``x @ (qw * sw)`` with in-kernel row quantization of ``x``.

    x: ``(..., K)`` bf16/f32; qw: ``(K, N)`` s8; sw: ``(1, N)`` f32.
    Returns ``(..., N)`` in ``x.dtype``.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = qw.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    block_m = min(block_m, _pad_to(m, 8))
    block_n = min(block_n, _pad_to(n, 128))
    pm = _pad_to(m, block_m)
    pn = _pad_to(n, block_n)
    if pm != m:
        x2 = jnp.pad(x2, ((0, pm - m), (0, 0)))
    if pn != n:
        qw = jnp.pad(qw, ((0, 0), (0, pn - n)))
        sw = jnp.pad(sw, ((0, 0), (0, pn - n)), constant_values=1.0)

    grid = (pm // block_m, pn // block_n)  # n innermost: qx scratch reused
    out = pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda mi, ni: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pm, pn), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, k), jnp.int8),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ]
        if _HAS_PLTPU
        else [],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
        if (_HAS_PLTPU and not interpret)
        else None,
    )(x2, qw, sw)
    return out[:m, :n].reshape(*lead, n)


def _use_qmm_kernel() -> bool:
    import os

    if os.environ.get("MMLEARN_INT8_QMM_INTERPRET") == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    import os

    return os.environ.get("MMLEARN_INT8_QMM_INTERPRET") == "1"


def _qmm_or_fallback(a: jax.Array, qw, sw, b_full: jax.Array) -> jax.Array:
    """Kernel on TPU (or interpret for tests); XLA-composed int8 elsewhere."""
    import math

    if _use_qmm_kernel() and supports_int8_qmm(
        math.prod(a.shape[:-1]), a.shape[-1], qw.shape[-1]
    ):
        return int8_qmm(a, qw, sw, interpret=_interpret())
    from mmlearn_tpu.modules.layers.quantization import _int8_fwd

    return _int8_fwd(a, b_full)


def _sb_primal(x, w):
    qw, sw = quantize_weight(w, axis=0)
    return _qmm_or_fallback(x, qw, sw, w)


@jax.custom_vjp
def switchback_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x @ w``: int8 forward + int8 dgrad (fused kernels), exact bf16 wgrad.

    The "switchback" split (fwd + dgrad = 2/3 of the matmul FLOPs on the
    int8 MXU; wgrad exact) keeps the optimizer trajectory close to bf16
    while avoiding wgrad's over-tokens quantization pass.
    """
    return _sb_primal(x, w)


def _sb_fwd(x, w):
    return _sb_primal(x, w), (x, w)


def _sb_bwd(residuals, g):
    x, w = residuals
    # dgrad: dx = g @ w.T — same kernel; w.T column scales == w row scales.
    # The bf16 transpose is cheap XLA work once per step per layer.
    wt = jnp.swapaxes(w, 0, 1)
    qwt, swt = quantize_weight(wt, axis=0)
    dx = _qmm_or_fallback(g, qwt, swt, wt).astype(x.dtype)
    # wgrad: exact (bf16/f32) — contraction over tokens
    lead = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((lead, lead), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return dx, dw


switchback_matmul.defvjp(_sb_fwd, _sb_bwd)
