"""Fused multi-head attention for short sequences (TPU Pallas).

Motivation (profiled on v5e, CLIP ViT-B/16 train step): at mmlearn sequence
lengths (77-257 tokens) the attention FLOPs are trivial, but XLA's attention
spends ~40% of the vision tower's time on layout work — transposing the qkv
projection output to ``(b, h, n, d)``, materializing softmax(QK^T) through
HBM, and re-transposing gradients. This kernel eliminates all of it:

- the qkv projection uses a **head-major packing** ``(B, N, H * [q|k|v] * D)``
  so each (batch-group, head-group) program reads one contiguous
  ``(G, N, HG*3D)`` block straight out of the Dense output — no transpose,
  no reshape (Mosaic requires the trailing block dim to be a multiple of 128,
  hence head *groups*: HG = lcm(3D, 128) / 3D, e.g. 2 heads for D=64);
- the whole sequence fits in VMEM, so scores/softmax never touch HBM
  (no online-softmax bookkeeping needed — one pass, exact);
- **no softmax residuals at all**: the backward kernel recomputes scores from
  the saved qkv block and re-derives the row max/normalizer — bitwise
  identical to the forward since the inputs and op order are identical
  (measured: storing the LSE through HBM nearly doubled kernel time due to
  its (2, N)-sublane layout);
- the backward writes the *packed* ``dqkv`` cotangent directly — XLA's Dense
  backward consumes it with zero layout ops;
- masking is statically elided when no key-validity mask is passed (the
  vision tower), and the causal mask is an in-register iota compare.

Replaces the reference's naive materializing attention
(/root/reference/mmlearn/modules/layers/attention.py:59-75) on the short-seq
path; long sequences route to :mod:`mmlearn_tpu.ops.flash_attention`.

Numerics: scores and softmax statistics are computed in f32 (VMEM-resident,
so the usual bf16-scores HBM-traffic tradeoff does not apply); the two MXU
matmuls run in the input dtype (bf16 in mixed precision).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def interleave_qkv_heads(kernel, num_heads: int):
    """Convert a ``[Wq | Wk | Wv]``-packed fused-qkv kernel (in, 3*out) to the
    head-major packing ``[h0_q | h0_k | h0_v | h1_q | ...]`` this kernel
    expects. Works for kernels (C, 3C), biases (3C,), and stacked scan params
    (depth, C, 3C) / (depth, 3C)."""
    import numpy as np

    arr = kernel
    lead = arr.shape[:-1]
    three_c = arr.shape[-1]
    c = three_c // 3
    d = c // num_heads
    a = arr.reshape(*lead, 3, num_heads, d)
    if isinstance(arr, np.ndarray):
        a = np.moveaxis(a, -3, -2)
    else:
        a = jnp.moveaxis(a, -3, -2)
    return a.reshape(*lead, three_c)


def uninterleave_qkv_heads(kernel, num_heads: int):
    """Inverse of :func:`interleave_qkv_heads`: head-major
    ``[h0_q | h0_k | h0_v | h1_q | ...]`` back to ``[Wq | Wk | Wv]`` packing.
    Same shape contract (kernels, biases, stacked scan params)."""
    import numpy as np

    arr = kernel
    lead = arr.shape[:-1]
    three_c = arr.shape[-1]
    c = three_c // 3
    d = c // num_heads
    a = arr.reshape(*lead, num_heads, 3, d)
    if isinstance(arr, np.ndarray):
        a = np.moveaxis(a, -2, -3)
    else:
        a = jnp.moveaxis(a, -2, -3)
    return a.reshape(*lead, three_c)


def _head_group(head_dim: int) -> int:
    """Heads per program so the qkv block's lane width is a LANES multiple."""
    width = 3 * head_dim
    return math.lcm(width, _LANES) // width


def _mha_reference_xla(
    qkv: jax.Array,
    mask: Optional[jax.Array],
    num_heads: int,
    scale: float,
    causal: bool,
) -> jax.Array:
    """Mathematically identical XLA path (CPU tests / fallback).

    Operates on the head-major packing.
    """
    b, n, three_c = qkv.shape
    d = three_c // (3 * num_heads)
    x = qkv.reshape(b, n, num_heads, 3, d)
    q, k, v = x[..., 0, :], x[..., 1, :], x[..., 2, :]  # (b, n, h, d)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :].astype(bool), s, _NEG)
    if causal:
        cm = jnp.tril(jnp.ones((n, n), dtype=bool))
        s = jnp.where(cm, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return o.reshape(b, n, num_heads * d).astype(qkv.dtype)


def _stack_units(qkv_ref, group, head_group, head_dim):
    """Stack the (sample, head) units of a (G, N, HG*3D) block into batched
    (U, N, D) q/k/v arrays, U = G*HG (unit-major: sample outer, head inner).
    One batched dot_general over U pipelines the MXU better than a python
    loop of small matmuls (measured +7% at ViT shapes)."""
    d = head_dim
    qs, ks, vs = [], [], []
    for g in range(group):
        for hh in range(head_group):
            base = hh * 3 * d
            qs.append(qkv_ref[g, :, base : base + d])
            ks.append(qkv_ref[g, :, base + d : base + 2 * d])
            vs.append(qkv_ref[g, :, base + 2 * d : base + 3 * d])
    return jnp.stack(qs), jnp.stack(ks), jnp.stack(vs)


_BATCH_NN = (((2,), (2,)), ((0,), (0,)))  # (U,N,D)x(U,N,D) -> (U,N,N)
_BATCH_ND = (((2,), (1,)), ((0,), (0,)))  # (U,N,N)x(U,N,D) -> (U,N,D)
_BATCH_TD = (((1,), (1,)), ((0,), (0,)))  # contract rows: (U,N,N)x(U,N,D)


def _scores_batched(q, k, mask, scale, causal, group, head_group, n):
    """Masked f32 score tensor (U, N, N) — shared by fwd and bwd so the
    backward's recomputed softmax statistics are bitwise identical."""
    s = jax.lax.dot_general(
        q, k, _BATCH_NN, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        # kv-validity per sample, repeated per head unit
        kv = jnp.stack(
            [mask[g, 0, :] for g in range(group) for _ in range(head_group)]
        )  # (U, N)
        s = jnp.where(kv[:, None, :], s, _NEG)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        s = jnp.where((row >= col)[None], s, _NEG)
    return s


def _fwd_kernel(
    *refs,
    scale: float,
    causal: bool,
    group: int,
    head_group: int,
    head_dim: int,
    has_mask: bool,
):
    if has_mask:
        mask_ref, qkv_ref, o_ref = refs
    else:
        qkv_ref, o_ref = refs
    d = head_dim
    n = qkv_ref.shape[1]
    q, k, v = _stack_units(qkv_ref, group, head_group, d)
    s = _scores_batched(
        q, k, mask_ref if has_mask else None, scale, causal, group,
        head_group, n,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, _BATCH_ND,
        preferred_element_type=jnp.float32,
    )  # (U, N, D)
    u = 0
    for g in range(group):
        for hh in range(head_group):
            o_ref[g, :, hh * d : (hh + 1) * d] = o[u].astype(o_ref.dtype)
            u += 1


def _bwd_kernel(
    *refs,
    scale: float,
    causal: bool,
    group: int,
    head_group: int,
    head_dim: int,
    has_mask: bool,
):
    if has_mask:
        mask_ref, qkv_ref, o_ref, do_ref, dqkv_ref = refs
    else:
        qkv_ref, o_ref, do_ref, dqkv_ref = refs
    d = head_dim
    n = qkv_ref.shape[1]
    q, k, v = _stack_units(qkv_ref, group, head_group, d)
    dos, outs = [], []
    for g in range(group):
        for hh in range(head_group):
            dos.append(do_ref[g, :, hh * d : (hh + 1) * d])
            outs.append(o_ref[g, :, hh * d : (hh + 1) * d])
    do = jnp.stack(dos)  # (U, N, D)
    out = jnp.stack(outs)

    # recompute softmax exactly as the forward did
    s = _scores_batched(
        q, k, mask_ref if has_mask else None, scale, causal, group,
        head_group, n,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # (U, N, N) == softmax(s)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1,
        keepdims=True,
    )  # (U, N, 1)
    import os

    if os.environ.get("MMLEARN_FUSED_ATTN_BWD") == "merged":
        # experiment: dv and dk share the contract-rows pattern — one
        # 2U-batch matmul (keeps p live longer; needs a smaller group)
        dp = jax.lax.dot_general(
            do, v, _BATCH_NN, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dsc = ds.astype(q.dtype)
        lhs = jnp.concatenate([p.astype(do.dtype), dsc], axis=0)
        rhs = jnp.concatenate([do, q], axis=0)
        both = jax.lax.dot_general(
            lhs, rhs, _BATCH_TD, preferred_element_type=jnp.float32
        )
        uu = dsc.shape[0]
        dv, dk = both[:uu], both[uu:]
        dq = jax.lax.dot_general(
            dsc, k, _BATCH_ND, preferred_element_type=jnp.float32
        )
    else:
        # order matters for peak VMEM: consume p (dv) before materializing
        # dp/ds so the two (U, N, N) f32 tensors don't overlap in liveness
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, _BATCH_TD,
            preferred_element_type=jnp.float32,
        )  # (U, N, D) — contracts p's query rows
        dp = jax.lax.dot_general(
            do, v, _BATCH_NN, preferred_element_type=jnp.float32
        )  # (U, N, N)
        ds = p * (dp - delta) * scale
        dsc = ds.astype(q.dtype)
        dq = jax.lax.dot_general(
            dsc, k, _BATCH_ND, preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            dsc, q, _BATCH_TD, preferred_element_type=jnp.float32
        )
    u = 0
    for g in range(group):
        for hh in range(head_group):
            base = hh * 3 * d
            dqkv_ref[g, :, base : base + d] = dq[u].astype(dqkv_ref.dtype)
            dqkv_ref[g, :, base + d : base + 2 * d] = dk[u].astype(
                dqkv_ref.dtype
            )
            dqkv_ref[g, :, base + 2 * d : base + 3 * d] = dv[u].astype(
                dqkv_ref.dtype
            )
            u += 1


def _packed_enabled(head_dim: int, seq: Optional[int] = None) -> bool:
    """Lane-packed variant for small head dims (D < 64, 128 % D == 0).

    At D=32/16 the per-unit matmuls contract only D of the MXU's 128-deep
    systolic array and fill only D of 128 output lanes. The packed kernel
    processes all ``P = 128/D`` heads of one sample together: q is
    concatenated to a full 128-lane block and K/V are laid out
    **block-diagonally** ``(P·N, 128)`` so one full-depth/full-width matmul
    computes every head's scores (cross-head terms hit structural zeros).
    This lifts the VMEM-model unit cap the per-head layout suffered (the
    I-JEPA predictor's D=32 ran at U=16 — VERDICT r2 item 7).

    Status: numerically verified (interpret-mode fwd/bwd tests at D=32/16,
    masked + causal) and, after lane-aligning the per-head blocks (the
    first cut's N=118 boundaries caused 25+-minute Mosaic compiles),
    measured on v5e at the predictor shape: **9.2 ms fwd+bwd vs 9.0 ms for
    the capped per-head default** (group sweep 2-6; both ~1.9x XLA).
    Scores/dq/dp get the 4x width/depth win but dk/dv pay the P× extra
    block-diagonal MACs, and the backward holds 5 of the 7 matmul units —
    the effects cancel. Kept **opt-in** (``MMLEARN_FUSED_ATTN_PACKED=1``)
    as the better layout for fwd-heavy small-D attention (inference /
    no-grad teachers); the training default stays the capped kernel.
    """
    import os

    if os.environ.get("MMLEARN_FUSED_ATTN_PACKED", "0") != "1":
        return False
    # D<=64: includes P=2 packing at D=64, where scores/dq/dp gain the full
    # 128-deep contraction (2x) while dk/dv pay only 2x block-diagonal MACs
    # — a better trade than the D=32 P=4 wash (see docstring)
    if not (head_dim <= 64 and 128 % head_dim == 0):
        return False
    if seq is not None and _packed_sample_bytes(seq, head_dim) > _BWD_VMEM_LIMIT:
        # even a single-sample packed program would exceed the scoped-VMEM
        # stack (all P heads live together) — fall back to the per-head
        # kernel, whose per-unit footprint is P× smaller
        return False
    return True


def _packed_np(n: int) -> int:
    """Per-head block stride in the packed layout: N padded to a full
    (8, 128) tile boundary so every block slice is lane- AND
    sublane-aligned (Mosaic compiles misaligned 118-offset slices
    pathologically slowly — see `_packed_enabled`)."""
    return ((n + _LANES - 1) // _LANES) * _LANES


def _blockdiag_kv(qkv_ref, i, p, d, n, offset):
    """Build a block-diagonal ``(P·Np, P·D)`` operand from head slices.

    Row block ``h`` holds head ``h``'s ``(N, D)`` slice (zero-padded to
    ``Np`` rows) in lane block ``h``; everything else is zero — matmuls
    against it select per-head terms, and the padding rows contribute
    nothing.
    """
    w = p * d
    np_ = _packed_np(n)
    rows = []
    for hh in range(p):
        sl = qkv_ref[i, :, hh * 3 * d + offset * d : hh * 3 * d + (offset + 1) * d]
        parts = []  # Mosaic rejects zero-width operands: skip empty pads
        if hh > 0:
            parts.append(jnp.zeros((n, hh * d), sl.dtype))
        parts.append(sl)
        if (p - hh - 1) > 0:
            parts.append(jnp.zeros((n, w - (hh + 1) * d), sl.dtype))
        blk = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        if np_ != n:
            blk = jnp.concatenate(
                [blk, jnp.zeros((np_ - n, w), sl.dtype)], axis=0
            )
        rows.append(blk)
    return jnp.concatenate(rows, axis=0)  # (P*Np, W)


def _cat_heads(ref, i, p, d, n, stride, offset):
    """Concatenate P head slices into one (N, P*D) lane-packed block."""
    return jnp.concatenate(
        [
            ref[i, :, hh * stride + offset * d : hh * stride + (offset + 1) * d]
            for hh in range(p)
        ],
        axis=1,
    )


def _packed_scores(q_cat, k_blk, mask_vec, scale, causal, p, n):
    """Per-head scores, lane-packed: ``(N, P·Np)`` with block h = head h.

    The ``Np - N`` padding columns of every block (zero rows in the
    block-diagonal K) are masked to -inf so the blockwise softmax ignores
    them.
    """
    np_ = _packed_np(n)
    s = jax.lax.dot_general(
        q_cat, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (N, P*Np)
    # one (Np,) template per block, tiled: valid key positions < n
    col = jax.lax.broadcasted_iota(jnp.int32, (n, np_), 1)
    keep = col < n
    if mask_vec is not None:
        pad = jnp.zeros((np_ - n,), dtype=bool) if np_ != n else None
        kv = (
            jnp.concatenate([mask_vec, pad]) if pad is not None else mask_vec
        )  # (Np,)
        keep = keep & kv[None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, np_), 0)
        keep = keep & (row >= col)
    s = jnp.where(jnp.concatenate([keep] * p, axis=1), s, _NEG)
    return s


def _packed_softmax(s, p, n):
    """Blockwise softmax over each head's Np-lane block of (N, P·Np)."""
    np_ = _packed_np(n)
    blocks = []
    for hh in range(p):
        sb = s[:, hh * np_ : (hh + 1) * np_]
        m = jnp.max(sb, axis=-1, keepdims=True)
        e = jnp.exp(sb - m)
        blocks.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return jnp.concatenate(blocks, axis=1)


def _fwd_kernel_packed(
    *refs, scale, causal, group, head_group, head_dim, has_mask
):
    if has_mask:
        mask_ref, qkv_ref, o_ref = refs
    else:
        qkv_ref, o_ref = refs
    p, d = head_group, head_dim
    n = qkv_ref.shape[1]
    for i in range(group):
        q_cat = _cat_heads(qkv_ref, i, p, d, n, 3 * d, 0)  # (N, 128)
        k_blk = _blockdiag_kv(qkv_ref, i, p, d, n, 1)
        v_blk = _blockdiag_kv(qkv_ref, i, p, d, n, 2)
        mask_vec = mask_ref[i, 0, :] if has_mask else None
        s = _packed_scores(q_cat, k_blk, mask_vec, scale, causal, p, n)
        p_cat = _packed_softmax(s, p, n)
        o = jax.lax.dot_general(
            p_cat.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, 128) = [o_h0 | o_h1 | ...]
        o_ref[i] = o.astype(o_ref.dtype)


def _bwd_kernel_packed(
    *refs, scale, causal, group, head_group, head_dim, has_mask
):
    if has_mask:
        mask_ref, qkv_ref, o_ref, do_ref, dqkv_ref = refs
    else:
        qkv_ref, o_ref, do_ref, dqkv_ref = refs
    p, d = head_group, head_dim
    n = qkv_ref.shape[1]
    w = p * d
    for i in range(group):
        q_cat = _cat_heads(qkv_ref, i, p, d, n, 3 * d, 0)
        k_blk = _blockdiag_kv(qkv_ref, i, p, d, n, 1)
        v_blk = _blockdiag_kv(qkv_ref, i, p, d, n, 2)
        mask_vec = mask_ref[i, 0, :] if has_mask else None
        s = _packed_scores(q_cat, k_blk, mask_vec, scale, causal, p, n)
        p_cat = _packed_softmax(s, p, n)  # (N, P*N) f32

        do_cat = do_ref[i]  # (N, 128) — already lane-packed by head
        out_cat = o_ref[i]

        # dp: full-depth (128) contraction against block-diagonal V
        dp = jax.lax.dot_general(
            do_cat, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, P*N)

        # ds per block: p * (dp - delta_h) * scale, delta_h from head lanes
        np_ = _packed_np(n)
        dof = do_cat.astype(jnp.float32)
        outf = out_cat.astype(jnp.float32)
        ds_blocks = []
        for hh in range(p):
            delta_h = jnp.sum(
                dof[:, hh * d : (hh + 1) * d] * outf[:, hh * d : (hh + 1) * d],
                axis=-1, keepdims=True,
            )  # (N, 1)
            ds_blocks.append(
                p_cat[:, hh * np_ : (hh + 1) * np_]
                * (dp[:, hh * np_ : (hh + 1) * np_] - delta_h) * scale
            )
        ds = jnp.concatenate(ds_blocks, axis=1)  # (N, P*Np) f32
        dsc = ds.astype(q_cat.dtype)

        # dq: (N, P*N) @ (P*N, 128) — full width, zeros select per-head K
        dq_cat = jax.lax.dot_general(
            dsc, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, 128)

        # dk/dv: contract the query axis. Outputs are (P*N, 128) with the
        # wanted per-head result in the DIAGONAL (row-block h, lane-block h);
        # off-diagonal blocks are cross-head garbage — P× extra MACs but at
        # full MXU width, a wash vs per-head matmuls at width D.
        dk_all = jax.lax.dot_general(
            dsc, q_cat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P*N, 128)
        dv_all = jax.lax.dot_general(
            p_cat.astype(do_cat.dtype), do_cat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P*N, 128)

        for hh in range(p):
            base = hh * 3 * d
            dqkv_ref[i, :, base : base + d] = dq_cat[
                :, hh * d : (hh + 1) * d
            ].astype(dqkv_ref.dtype)
            dqkv_ref[i, :, base + d : base + 2 * d] = dk_all[
                hh * np_ : hh * np_ + n, hh * d : (hh + 1) * d
            ].astype(dqkv_ref.dtype)
            dqkv_ref[i, :, base + 2 * d : base + 3 * d] = dv_all[
                hh * np_ : hh * np_ + n, hh * d : (hh + 1) * d
            ].astype(dqkv_ref.dtype)


def _packed_sample_bytes(seq: int, head_dim: int) -> int:
    """Scoped-VMEM estimate per sample for the packed backward: ~3 f32
    (N, P·N) score-sized temporaries + 2 block-diagonal operands +
    2 (P·N, 128) f32 outputs + ~6 (N, 128) rows."""
    p = 128 // head_dim
    sub = _pad_to8(seq)
    pn = p * _packed_np(seq)  # packed lane stride per block is Np
    return (3 * sub * pn + 4 * pn * 128 + 6 * sub * 128) * 4


def _bwd_unit_bytes(seq: int, head_dim: int) -> int:
    """Estimated scoped-VMEM bytes per (sample, head) unit in the backward.

    ~3 live f32 ``(N, N)`` score-sized temporaries plus ~6 f32 ``(N, D)``
    operand/gradient rows, with Mosaic's (8, 128) tile padding. Calibrated
    against two measured points: ViT-B (U=16, N=197, D=64) compiles at
    ~19.7 MB est.; the I-JEPA predictor (U=64, N=118, D=32) overflowed at
    39.7 MB measured vs 35.4 MB est.
    """
    sub = _pad_to8(seq)
    lane = ((seq + _LANES - 1) // _LANES) * _LANES
    dlane = max(((head_dim + _LANES - 1) // _LANES) * _LANES, _LANES)
    return (3 * sub * lane + 6 * sub * dlane) * 4


def _pad_to8(n: int) -> int:
    return ((n + 7) // 8) * 8


_BWD_VMEM_LIMIT = 20 * 1024 * 1024  # ViT-B's proven working point ≈ 19.7 MB


def _pick_group(batch: int, seq: int, head_dim: int, head_group: int) -> int:
    """Largest sample group with a comfortable VMEM footprint."""
    import os

    override = os.environ.get("MMLEARN_FUSED_ATTN_GROUP")
    budget = 3 * 1024 * 1024  # qkv+out+do blocks per program
    per_sample = seq * head_group * head_dim * 2 * (3 + 2)
    g = max(1, min(32, budget // max(per_sample, 1)))
    # the backward's f32 temporaries must fit the 16 MB scoped-VMEM stack:
    # bound the unit count by the byte model (see _bwd_unit_bytes)
    if _packed_enabled(head_dim, seq):
        # lane-packed kernel: VMEM scales per sample (all heads together).
        # The sample loop is python-unrolled in the kernel body; Mosaic
        # compile time grows steeply with the unroll (a g=8 predictor body
        # sat in remote compile for 25+ min), so keep the group small —
        # the packed matmuls are already full-width/full-depth per sample.
        g = min(g, int(os.environ.get("MMLEARN_FUSED_ATTN_PACKED_GROUP", "2")))
        unit = _packed_sample_bytes(seq, head_dim)
        while g > 1 and g * unit > _BWD_VMEM_LIMIT:
            g -= 1
    else:
        unit = _bwd_unit_bytes(seq, head_dim)
        while g > 1 and g * head_group * unit > _BWD_VMEM_LIMIT:
            g -= 1
        if head_group > 2:
            # small head dims additionally measured tighter in practice (the
            # predictor's 39.7 MB at U=64 vs the 35.4 MB estimate): keep the
            # compile-proven U=16 ceiling
            g = min(g, max(1, 16 // head_group))
        else:
            # D=64 shapes: cap at 32 units, the largest compile-proven
            # count. The byte model is not shape-uniform — at N=77 it
            # *under*-counts real scoped usage (b384 text tower picked 48
            # units = 22.97 MB measured vs the 16 MB hardware limit; 32
            # units ≈ 15.3 MB fits) while at N=197 it over-counts (16
            # units proven). b256 only avoided the overflow because the
            # batch-divisor fallback happened to land on 16.
            g = min(g, max(1, 32 // head_group))
    if override:
        g = int(override)
    while batch % g:
        g -= 1
    return max(g, 1)


def _kernel_config(qkv, num_heads, interpret):
    b, n, three_c = qkv.shape
    d = three_c // (3 * num_heads)
    if interpret:
        # interpret mode normally drops head grouping (hg=1) for simplicity,
        # but the packed small-D variant *is* the head grouping — keep it so
        # CPU tests execute the packed kernel bodies
        packed = _packed_enabled(d, n) and num_heads % _head_group(d) == 0
        hg = _head_group(d) if packed else 1
    else:
        hg = _head_group(d)
    g = _pick_group(b, n, d, hg)
    return b, n, d, hg, g


def supports_fused(num_heads: int, head_dim: int, seq: int) -> bool:
    """Static dispatch predicate for the fused short-seq kernel."""
    if seq > 2048:  # scores (N, N) f32 must fit comfortably in VMEM
        return False
    hg = _head_group(head_dim)
    if num_heads % hg:
        return False
    # even a single-sample program must fit the backward's scoped VMEM
    # (long-but-<=2048 sequences route to XLA/flash instead)
    return hg * _bwd_unit_bytes(seq, head_dim) <= _BWD_VMEM_LIMIT


def _common_specs(b, n, d, hg, g, has_mask):
    specs = []
    if has_mask:
        specs.append(
            pl.BlockSpec((g, 1, n), lambda bi, h: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    specs.append(
        pl.BlockSpec((g, n, hg * 3 * d), lambda bi, h: (bi, 0, h),
                     memory_space=pltpu.VMEM)
    )
    return specs


def _out_spec(n, d, hg, g):
    return pl.BlockSpec((g, n, hg * d), lambda bi, h: (bi, 0, h),
                        memory_space=pltpu.VMEM)


def _compiler_params(interpret):
    if _HAS_PLTPU and not interpret:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        )
    return None


def _fwd_pallas(qkv, mask, num_heads, scale, causal, interpret=False):
    b, n, d, hg, g = _kernel_config(qkv, num_heads, interpret)
    has_mask = mask is not None
    grid = (b // g, num_heads // hg)
    body = (
        _fwd_kernel_packed
        if _packed_enabled(d, n) and hg == 128 // d
        else _fwd_kernel
    )
    kernel = functools.partial(
        body, scale=float(scale), causal=causal, group=g,
        head_group=hg, head_dim=d, has_mask=has_mask,
    )
    args = [qkv]
    if has_mask:
        args.insert(0, mask.reshape(b, 1, n))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_common_specs(b, n, d, hg, g, has_mask),
        out_specs=_out_spec(n, d, hg, g),
        out_shape=jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*args)
    return out


def _bwd_pallas(qkv, mask, out, g_out, num_heads, scale, causal,
                interpret=False):
    b, n, d, hg, g = _kernel_config(qkv, num_heads, interpret)
    has_mask = mask is not None
    grid = (b // g, num_heads // hg)
    body = (
        _bwd_kernel_packed
        if _packed_enabled(d, n) and hg == 128 // d
        else _bwd_kernel
    )
    kernel = functools.partial(
        body, scale=float(scale), causal=causal, group=g,
        head_group=hg, head_dim=d, has_mask=has_mask,
    )
    in_specs = _common_specs(b, n, d, hg, g, has_mask) + [
        _out_spec(n, d, hg, g),  # saved forward output
        _out_spec(n, d, hg, g),  # cotangent
    ]
    args = [qkv, out, g_out]
    if has_mask:
        args.insert(0, mask.reshape(b, 1, n))
    dqkv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, n, hg * 3 * d), lambda bi, h: (bi, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 3 * num_heads * d), qkv.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*args)
    return dqkv


def _attn_kernel_mode(num_heads: int, head_dim: int, seq: int):
    """``None`` (XLA math) | ``'pallas'`` | ``'interpret'``.

    ``MMLEARN_FUSED_ATTN_INTERPRET=1`` forces the Pallas kernels in
    interpreter mode regardless of backend — CPU tests then execute the
    exact kernel path (including inside the shard_map plan with
    ``check_vma=False``) that a multi-chip TPU job runs.
    """
    import os

    if os.environ.get("MMLEARN_FUSED_ATTN", "1") == "0":
        return None
    if not supports_fused(num_heads, head_dim, seq):
        return None
    if os.environ.get("MMLEARN_FUSED_ATTN_INTERPRET") == "1":
        return "interpret"
    try:
        return "pallas" if jax.default_backend() == "tpu" else None
    except Exception:  # pragma: no cover
        return None


def _use_pallas(num_heads: int, head_dim: int, seq: int) -> bool:
    return _attn_kernel_mode(num_heads, head_dim, seq) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_mha_nomask(qkv, num_heads, scale, causal):
    mode = _attn_kernel_mode(num_heads, qkv.shape[-1] // (3 * num_heads),
                             qkv.shape[1])
    if mode is None:
        return _mha_reference_xla(qkv, None, num_heads, scale, causal)
    return _fwd_pallas(qkv, None, num_heads, scale, causal,
                       interpret=mode == "interpret")


def _fused_mha_nomask_fwd(qkv, num_heads, scale, causal):
    d = qkv.shape[-1] // (3 * num_heads)
    mode = _attn_kernel_mode(num_heads, d, qkv.shape[1])
    if mode is None:
        out = _mha_reference_xla(qkv, None, num_heads, scale, causal)
        return out, (qkv, None)
    out = _fwd_pallas(qkv, None, num_heads, scale, causal,
                      interpret=mode == "interpret")
    out = checkpoint_name(out, "attn_out")
    return out, (qkv, out)


def _fused_mha_nomask_bwd(num_heads, scale, causal, residuals, g):
    qkv, out = residuals
    if out is None:
        def _ref(qkv):
            return _mha_reference_xla(qkv, None, num_heads, scale, causal)

        _, vjp = jax.vjp(_ref, qkv)
        (dqkv,) = vjp(g)
        return (dqkv,)
    mode = _attn_kernel_mode(num_heads, qkv.shape[-1] // (3 * num_heads),
                             qkv.shape[1])
    return (_bwd_pallas(qkv, None, out, g, num_heads, scale, causal,
                        interpret=mode == "interpret"),)


_fused_mha_nomask.defvjp(_fused_mha_nomask_fwd, _fused_mha_nomask_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_mha_masked(qkv, mask, num_heads, scale, causal):
    mode = _attn_kernel_mode(num_heads, qkv.shape[-1] // (3 * num_heads),
                             qkv.shape[1])
    if mode is None:
        return _mha_reference_xla(qkv, mask, num_heads, scale, causal)
    return _fwd_pallas(qkv, mask, num_heads, scale, causal,
                       interpret=mode == "interpret")


def _fused_mha_masked_fwd(qkv, mask, num_heads, scale, causal):
    d = qkv.shape[-1] // (3 * num_heads)
    mode = _attn_kernel_mode(num_heads, d, qkv.shape[1])
    if mode is None:
        out = _mha_reference_xla(qkv, mask, num_heads, scale, causal)
        return out, (qkv, mask, None)
    out = _fwd_pallas(qkv, mask, num_heads, scale, causal,
                      interpret=mode == "interpret")
    out = checkpoint_name(out, "attn_out")
    return out, (qkv, mask, out)


def _fused_mha_masked_bwd(num_heads, scale, causal, residuals, g):
    qkv, mask, out = residuals
    if out is None:
        def _ref(qkv):
            return _mha_reference_xla(qkv, mask, num_heads, scale, causal)

        _, vjp = jax.vjp(_ref, qkv)
        (dqkv,) = vjp(g)
        return dqkv, None
    mode = _attn_kernel_mode(num_heads, qkv.shape[-1] // (3 * num_heads),
                             qkv.shape[1])
    dqkv = _bwd_pallas(qkv, mask, out, g, num_heads, scale, causal,
                       interpret=mode == "interpret")
    return dqkv, None


_fused_mha_masked.defvjp(_fused_mha_masked_fwd, _fused_mha_masked_bwd)


def _shard_map_plan(num_heads: int, head_dim: int, b: int):
    """Mesh + specs for running the kernel per-shard on a >1-device mesh.

    ``pallas_call`` has no GSPMD partitioning rule, so on a sharded mesh the
    fused kernel is wrapped in ``jax.shard_map`` over the canonical
    ``data×fsdp×model`` layout: batch sharded over (data, fsdp), heads over
    model (Megatron-style — the head-major qkv packing makes the channel
    split land exactly on head boundaries). Returns ``(mesh, batch_axes,
    model_axis, local_heads)``; ``None`` when the kernel should run
    unwrapped (single device / opt-out); or the string ``"xla"`` when the
    mesh is sharded but this kernel cannot be shard_mapped onto it — the
    caller MUST then use plain XLA math (GSPMD partitions that fine; a raw
    ``pallas_call`` on sharded operands has no partitioning rule and would
    error or gather the full global activation onto every chip).
    """
    import os

    if os.environ.get("MMLEARN_FUSED_ATTN_SHARD", "1") == "0":
        return None
    if os.environ.get("MMLEARN_FUSED_ATTN", "1") == "0":
        # kernel disabled entirely -> let GSPMD partition the XLA math
        return None
    from mmlearn_tpu.parallel.mesh import peek_global_mesh

    mesh = peek_global_mesh()
    if mesh is None or mesh.size <= 1:
        return None
    extra = set(mesh.axis_names) - {"data", "fsdp", "model"}
    if any(mesh.shape[a] > 1 for a in extra):
        # a >1 'seq' (or foreign) axis: this short-seq kernel does not
        # sequence-shard — the XLA path / ring attention handles it
        return "xla"
    batch_axes = tuple(
        a for a in ("data", "fsdp") if a in mesh.axis_names
    )
    batch_shards = 1
    for a in batch_axes:
        batch_shards *= mesh.shape[a]
    if batch_shards == 0 or b % batch_shards:
        return "xla"
    model_shards = mesh.shape.get("model", 1)
    model_axis = "model" if model_shards > 1 else None
    if num_heads % model_shards:
        return "xla"
    local_heads = num_heads // model_shards
    # per-shard head count must still tile the kernel's head groups
    if local_heads % _head_group(head_dim):
        return "xla"
    return mesh, batch_axes, model_axis, local_heads


def fused_mha(
    qkv: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    causal: bool = False,
) -> jax.Array:
    """Head-major packed multi-head self-attention.

    Args:
        qkv: ``(B, N, H * 3 * D)`` fused projection output, packed head-major
            (``interleave_qkv_heads`` converts [q|k|v]-major weights).
        mask: optional ``(B, N)`` boolean key-validity mask (True = attend).
            Pass None when all keys are valid — the masking VPU work is
            statically elided (measured ~2x kernel time at ViT shapes).
        num_heads: number of attention heads ``H``.
        scale: logit scale; defaults to ``D ** -0.5``.
        causal: apply a causal mask.

    Returns:
        ``(B, N, H * D)`` attention output.
    """
    b, n, three_c = qkv.shape
    if three_c % (3 * num_heads):
        raise ValueError(f"qkv dim {three_c} not divisible by 3*{num_heads}")
    d = three_c // (3 * num_heads)
    if scale is None:
        scale = float(d) ** -0.5
    scale = float(scale)

    plan = _shard_map_plan(num_heads, d, b)
    if plan == "xla":
        # sharded mesh the kernel cannot be shard_mapped onto: plain XLA
        # attention math, which GSPMD partitions across the mesh
        return _mha_reference_xla(
            qkv, None if mask is None else mask.astype(bool), num_heads,
            scale, causal,
        )
    if plan is not None:
        from jax.sharding import PartitionSpec as P

        mesh, batch_axes, model_axis, local_heads = plan
        qkv_spec = P(batch_axes, None, model_axis)
        out_spec = P(batch_axes, None, model_axis)
        if mask is None:

            def _local_nomask(qkv):
                return _fused_mha_nomask(qkv, local_heads, scale, causal)

            # check_vma=False: pallas_call carries no varying-manual-axes
            # metadata; per-shard correctness is covered by the sharded tests
            return jax.shard_map(
                _local_nomask,
                mesh=mesh,
                in_specs=(qkv_spec,),
                out_specs=out_spec,
                check_vma=False,
            )(qkv)

        def _local_masked(qkv, mask):
            return _fused_mha_masked(qkv, mask, local_heads, scale, causal)

        return jax.shard_map(
            _local_masked,
            mesh=mesh,
            in_specs=(qkv_spec, P(batch_axes, None)),
            out_specs=out_spec,
            check_vma=False,
        )(qkv, mask.astype(bool))

    if mask is None:
        return _fused_mha_nomask(qkv, num_heads, scale, causal)
    return _fused_mha_masked(qkv, mask.astype(bool), num_heads, scale, causal)


def fused_mha_interpret(qkv, mask=None, *, num_heads, scale=None, causal=False):
    """Run the Pallas forward in interpreter mode (CPU correctness tests)."""
    d = qkv.shape[-1] // (3 * num_heads)
    if scale is None:
        scale = float(d) ** -0.5
    mask = None if mask is None else mask.astype(bool)
    return _fwd_pallas(qkv, mask, num_heads, float(scale), causal,
                       interpret=True)


def fused_mha_bwd_interpret(
    qkv, g, mask=None, *, num_heads, scale=None, causal=False
):
    """Run fwd+bwd Pallas kernels in interpreter mode; returns dqkv."""
    d = qkv.shape[-1] // (3 * num_heads)
    if scale is None:
        scale = float(d) ** -0.5
    mask = None if mask is None else mask.astype(bool)
    out = _fwd_pallas(qkv, mask, num_heads, float(scale), causal,
                      interpret=True)
    return _bwd_pallas(qkv, mask, out, g, num_heads, float(scale), causal,
                       interpret=True)
