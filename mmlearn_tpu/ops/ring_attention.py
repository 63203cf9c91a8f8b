"""Ring attention over a ``seq`` mesh axis (sequence parallelism).

Long-context attention for sequences that exceed one chip's HBM: the
sequence is sharded over the mesh's ``seq`` axis, every device keeps its
query block resident, and key/value blocks rotate around the ring with
``jax.lax.ppermute`` — each hop overlaps the neighbour transfer (ICI) with
the local block's matmuls, so the full (N, N) score matrix never exists on
any chip and memory stays O(N / ring_size) per device.

Each hop computes a *block-normalized* attention ``(o_i, lse_i)`` over the
resident kv block and folds it into a running output with the standard
log-sum-exp merge (the split-k / flash-decoding recurrence) — exact, and
independent of hop order. The per-hop block math has two backends:

- **XLA einsums** (default; CPU tests, causal towers): materializes the
  local (nq, nk) score block only;
- **Pallas flash kernels** (:mod:`mmlearn_tpu.ops.flash_attention`) on TPU
  for non-causal blocks at long per-shard lengths — the fwd returns exactly
  the ``(out, lse)`` pair the merge needs, and the bwd kernels take the
  *global* ``lse``/``out`` so each hop's ``dq``/``dk``/``dv`` contributions
  are computed against the full-softmax weights with no extra bookkeeping.
  (Causal blocks keep the XLA backend: the flash kernels index positions
  block-locally, while ring causality is over global positions.)

The backward rotates ``(k, v, dk, dv)`` a full circle so every block's
gradient contributions return to their owner. Causal masking uses global
positions; blocks entirely in the future are skipped with ``lax.cond``
(they still forward the ring transfer), halving average causal compute.

The reference has no sequence parallelism at all (attention materializes
softmax(QK^T) on one GPU — /root/reference/mmlearn/modules/layers/
attention.py:59-75); this is a capability the TPU mesh design adds for the
audio/video/long-text encoders. Related public technique: Ring Attention
(Liu et al., 2023); the blockwise merge follows the same recurrence as
:mod:`mmlearn_tpu.ops.flash_attention`.

Layout: per-device blocks are ``(B, H, nq, D)`` (the long-seq layout used by
the flash kernel). Use :func:`sequence_sharded_attention` to apply it to
globally-sharded arrays via ``shard_map``; :func:`ring_attention` is the
per-shard collective form for use inside an existing ``shard_map``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_block_mode(
    nq: int, nk: int, d: int, causal: bool
) -> Optional[bool]:
    """Route per-hop block attention to the Pallas flash kernels.

    Returns ``None`` for the XLA block backend, else the ``interpret`` flag
    for the flash backend. Non-causal only (ring causality is global-position
    based; the flash kernels index block-locally). Threshold is per-shard:
    the flash path wins once the (nq, nk) f32 score block stops fitting
    comfortably on chip — default 2048 local tokens, tunable for pod runs.

    ``MMLEARN_RING_FLASH_INTERPRET=1`` forces the flash backend in Pallas
    interpret mode regardless of backend/size — this is how CPU tests
    exercise the exact fwd/bwd merge path a pod run executes.
    """
    if causal:
        return None
    if os.environ.get("MMLEARN_RING_FLASH_INTERPRET") == "1":
        return True
    min_block = int(os.environ.get("MMLEARN_RING_FLASH_MIN_BLOCK", "2048"))
    if nq < min_block or nk < min_block:
        return None
    if d % 128 and d != 64:  # lane-tile friendly head dims only
        return None
    from mmlearn_tpu.ops.flash_attention import _use_pallas

    return False if _use_pallas() else None


def _block_scores(q, k, scale, causal, q_pos, k_pos):
    """Masked f32 scores + keep mask for one (q-block, kv-block) pair.

    The keep mask must be applied to ``exp`` terms explicitly: in a row with
    no valid keys yet the running max equals the mask fill value, and
    ``exp(fill - fill) = 1`` would inject bogus probability mass.
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    keep = None
    if causal:
        keep = (q_pos[:, None] >= k_pos[None, :])[None, None]
        s = jnp.where(keep, s, _NEG)
    return s, keep


def _block_attn_xla(q, k_blk, v_blk, scale, causal, q_pos, k_pos):
    """One kv-block attention, block-normalized: returns (o, lse).

    o is softmax-within-block @ v (f32); lse is the block's
    log-sum-exp of scaled scores, -inf-ish (_NEG) for rows with no valid
    keys (o is 0 there).
    """
    s, keep = _block_scores(q, k_blk, scale, causal, q_pos, k_pos)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if keep is not None:
        p = jnp.where(keep, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", (p / jnp.maximum(l, 1e-37)).astype(v_blk.dtype),
        v_blk, preferred_element_type=jnp.float32,
    )
    lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-37)), _NEG)
    # rows with zero mass must contribute nothing to the merge
    o = jnp.where(l > 0.0, o, 0.0)
    return o, lse


def _block_attn_flash(q, k_blk, v_blk, scale, interpret=False):
    """Flash-kernel block attention (non-causal): returns (o f32, lse).

    The kernel emits its partial output in f32 (``out_dtype``) so the
    log-sum-exp merge runs at the same precision as the XLA block backend —
    no per-hop bf16 round-trip, no backend-dependent drift with ring size.
    """
    from mmlearn_tpu.ops.flash_attention import _flash_forward_pallas

    b, h, nk, _ = k_blk.shape
    mask = jnp.ones((b, nk), dtype=bool)
    o, lse = _flash_forward_pallas(
        q, k_blk, v_blk, mask, scale, causal=False,
        block_q=512, block_k=512, interpret=interpret,
        out_dtype=jnp.float32,
    )
    nq = q.shape[2]
    lse = lse.reshape(b, h, 1, -1)[:, :, 0, :nq, None]  # (B,H,nq,1) f32
    return o, lse


def _block_attn_bwd_xla(
    q, k_blk, v_blk, do, delta, lse, scale, causal, q_pos, k_pos
):
    """Per-hop backward against the global softmax: p = exp(s - lse_global).

    Returns (dq_contrib, dk_blk_contrib, dv_blk_contrib) in f32.
    """
    s, keep = _block_scores(q, k_blk, scale, causal, q_pos, k_pos)
    p = jnp.exp(s - lse)
    if keep is not None:
        p = jnp.where(keep, p, 0.0)
    dv = jnp.einsum(
        "bhqk,bhqd->bhkd", p, do, preferred_element_type=jnp.float32
    )
    dp = jnp.einsum(
        "bhqd,bhkd->bhqk", do, v_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * jnp.float32(scale)
    dq = jnp.einsum(
        "bhqk,bhkd->bhqd", ds, k_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dk = jnp.einsum(
        "bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


def _block_attn_bwd_flash(q, k_blk, v_blk, do, out, lse, scale,
                          interpret=False):
    """Flash-kernel per-hop backward (non-causal).

    The flash bwd kernels consume ``out``/``lse`` as given — passing the
    *merged* global values yields this block's exact contribution to
    dq/dk/dv under the full softmax.
    """
    from mmlearn_tpu.ops.flash_attention import (
        _flash_backward_pallas,
        _pad_to,
    )

    b, h, nq, d = q.shape
    nk = k_blk.shape[2]
    mask = jnp.ones((b, nk), dtype=bool)
    block_q = min(512, max(_pad_to(nq, 8), 8))
    pq = _pad_to(nq, block_q)
    lse_flat = lse[..., 0].reshape(b * h, 1, nq)  # (BH, 1, nq) f32
    if pq != nq:
        lse_flat = jnp.pad(lse_flat, ((0, 0), (0, 0), (0, pq - nq)))
    dq, dk, dv = _flash_backward_pallas(
        q, k_blk, v_blk, mask, out.astype(q.dtype), lse_flat,
        do.astype(q.dtype), scale, causal=False,
        block_q=512, block_k=512, interpret=interpret,
    )
    return dq.astype(jnp.float32), dk.astype(jnp.float32), dv.astype(
        jnp.float32
    )


def _positions(idx, n, size):
    return idx * n + lax.iota(jnp.int32, n)


def _ring_perm(axis_size: int):
    return [(j, (j + 1) % axis_size) for j in range(axis_size)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    causal: bool,
    axis_name: str,
    axis_size: int,
) -> jax.Array:
    """Collective attention over the ``axis_name`` ring (per-shard form).

    Args:
        q, k, v: local blocks ``(B, H, n_local, D)`` — the sequence axis is
            sharded over ``axis_name``; batch/head axes may be sharded over
            other mesh axes (they stay local).
        scale: logit scale (``D ** -0.5`` for standard attention).
        causal: apply a causal mask over *global* positions.
        axis_name: mesh axis the sequence is sharded over.
        axis_size: static size of that axis (ring length).

    Returns:
        Local attention output block ``(B, H, n_local, D)``.
    """
    out, _ = _ring_fwd_loop(q, k, v, scale, causal, axis_name, axis_size)
    return out


def _merge(out_run, lse_run, o_i, lse_i):
    """Fold one block-normalized (o_i, lse_i) into the running pair."""
    lse_new = jnp.maximum(lse_run, lse_i) + jnp.log1p(
        jnp.exp(-jnp.abs(lse_run - lse_i))
    )
    # both -inf-ish (no valid keys anywhere yet): keep the fill value and
    # zero contributions
    dead = jnp.maximum(lse_run, lse_i) <= _NEG / 2
    lse_new = jnp.where(dead, _NEG, lse_new)
    c_run = jnp.where(dead, 0.0, jnp.exp(lse_run - lse_new))
    c_i = jnp.where(dead, 0.0, jnp.exp(lse_i - lse_new))
    return out_run * c_run + o_i * c_i, lse_new


def _ring_fwd_loop(q, k, v, scale, causal, axis_name, axis_size):
    idx = lax.axis_index(axis_name)
    b, h, nq, d = q.shape
    nk = k.shape[2]
    q_pos = _positions(idx, nq, axis_size)
    perm = _ring_perm(axis_size)
    flash_mode = _flash_block_mode(nq, nk, d, causal)

    # accumulators derived from q so their varying-manual-axes type matches
    # the shard_map inputs (lax.cond requires branch outputs to agree)
    lse = q[..., :1].astype(jnp.float32) * 0.0 + _NEG  # (B,H,nq,1)
    acc = q.astype(jnp.float32) * 0.0
    k_blk, v_blk = k, v

    for step in range(axis_size):
        src = (idx - step) % axis_size
        k_pos = _positions(src, nk, axis_size)

        def _visit(args, k_blk=k_blk, v_blk=v_blk, k_pos=k_pos):
            acc, lse = args
            if flash_mode is not None:
                o_i, lse_i = _block_attn_flash(
                    q, k_blk, v_blk, scale, interpret=flash_mode
                )
            else:
                o_i, lse_i = _block_attn_xla(
                    q, k_blk, v_blk, scale, causal, q_pos, k_pos
                )
            return _merge(acc, lse, o_i, lse_i)

        if causal and nq == nk:
            # blocks entirely in the future contribute nothing; skip the
            # matmuls but keep the ring transfer moving
            acc, lse = lax.cond(
                src <= idx, _visit, lambda args: args, (acc, lse)
            )
        else:
            acc, lse = _visit((acc, lse))

        if step < axis_size - 1:
            k_blk, v_blk = lax.ppermute(
                (k_blk, v_blk), axis_name, perm
            )

    return acc.astype(q.dtype), lse


def _ring_fwd(q, k, v, scale, causal, axis_name, axis_size):
    out, lse = _ring_fwd_loop(q, k, v, scale, causal, axis_name, axis_size)
    return out, (q, k, v, out, lse)


def _ring_bwd(scale, causal, axis_name, axis_size, residuals, g):
    q, k, v, out, lse = residuals
    idx = lax.axis_index(axis_name)
    b, h, nq, d = q.shape
    nk = k.shape[2]
    q_pos = _positions(idx, nq, axis_size)
    perm = _ring_perm(axis_size)
    flash_mode = _flash_block_mode(nq, nk, d, causal)

    do = g.astype(jnp.float32)
    delta = jnp.sum(
        do * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B,H,nq,1)

    dq = q.astype(jnp.float32) * 0.0
    k_blk, v_blk = k, v
    dk_blk = k.astype(jnp.float32) * 0.0
    dv_blk = v.astype(jnp.float32) * 0.0

    for step in range(axis_size):
        src = (idx - step) % axis_size
        k_pos = _positions(src, nk, axis_size)

        def _visit(args, k_blk=k_blk, v_blk=v_blk, k_pos=k_pos):
            dq, dk_blk, dv_blk = args
            if flash_mode is not None:
                dq_i, dk_i, dv_i = _block_attn_bwd_flash(
                    q, k_blk, v_blk, do, out, lse, scale,
                    interpret=flash_mode,
                )
            else:
                dq_i, dk_i, dv_i = _block_attn_bwd_xla(
                    q, k_blk, v_blk, do, delta, lse, scale, causal,
                    q_pos, k_pos,
                )
            return dq + dq_i, dk_blk + dk_i, dv_blk + dv_i

        if causal and nq == nk:
            dq, dk_blk, dv_blk = lax.cond(
                src <= idx, _visit, lambda args: args, (dq, dk_blk, dv_blk)
            )
        else:
            dq, dk_blk, dv_blk = _visit((dq, dk_blk, dv_blk))

        # rotate kv together with its accumulated gradients; after
        # axis_size rotations both are back at the owning device
        k_blk, v_blk, dk_blk, dv_blk = lax.ppermute(
            (k_blk, v_blk, dk_blk, dv_blk), axis_name, perm
        )

    return dq.astype(q.dtype), dk_blk.astype(k.dtype), dv_blk.astype(v.dtype)


ring_attention.defvjp(_ring_fwd, _ring_bwd)


def sequence_sharded_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: jax.sharding.Mesh,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    seq_axis: str = "seq",
    batch_axes: Tuple[str, ...] = ("data", "fsdp"),
    model_axis: str = "model",
) -> jax.Array:
    """Apply ring attention to globally-shaped ``(B, H, N, D)`` arrays.

    Shards batch over ``batch_axes``, heads over ``model_axis``, and the
    sequence over ``seq_axis``; composes sequence parallelism with data and
    tensor parallelism on the same mesh.
    """
    from jax.sharding import PartitionSpec as P

    if seq_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{seq_axis}' axis: {mesh.axis_names}")
    axis_size = mesh.shape[seq_axis]
    n = q.shape[2]
    if n % axis_size:
        raise ValueError(f"seq len {n} not divisible by ring size {axis_size}")
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    batch_axes = tuple(a for a in batch_axes if a in mesh.axis_names)
    model = model_axis if model_axis in mesh.axis_names else None
    spec = P(batch_axes if batch_axes else None, model, seq_axis, None)

    scale_f = float(scale)
    size = int(axis_size)

    def _local(q, k, v):
        return ring_attention(q, k, v, scale_f, causal, seq_axis, size)

    # check_vma=False: pallas_call (the flash block backend) does not carry
    # varying-manual-axes metadata through its out_shape, and the ring's
    # correctness is covered by the multi-device tests
    return jax.shard_map(
        _local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
