"""Ring attention over a ``seq`` mesh axis (sequence parallelism).

Long-context attention for sequences that exceed one chip's HBM: the
sequence is sharded over the mesh's ``seq`` axis, every device keeps its
query block resident, and key/value blocks rotate around the ring with
``jax.lax.ppermute`` — each hop overlaps the neighbour transfer (ICI) with
the local block's matmuls, so the full (N, N) score matrix never exists on
any chip and memory stays O(N / ring_size) per device.

Softmax is computed online (running max / normalizer, f32), exactly as in
flash attention; the backward re-derives the normalized weights from the
saved statistics and rotates ``(k, v, dk, dv)`` a full circle so every
block's gradient contributions return to their owner. Causal masking uses
global positions; blocks entirely in the future are skipped with
``lax.cond`` (they still forward the ring transfer), halving average causal
compute.

The reference has no sequence parallelism at all (attention materializes
softmax(QK^T) on one GPU — /root/reference/mmlearn/modules/layers/
attention.py:59-75); this is a capability the TPU mesh design adds for the
audio/video/long-text encoders. Related public technique: Ring Attention
(Liu et al., 2023); the blockwise accumulation here follows the same
recurrence as :mod:`mmlearn_tpu.ops.flash_attention`.

Layout: per-device blocks are ``(B, H, nq, D)`` (the long-seq layout used by
the flash kernel). Use :func:`sequence_sharded_attention` to apply it to
globally-sharded arrays via ``shard_map``; :func:`ring_attention` is the
per-shard collective form for use inside an existing ``shard_map``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


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
    out, _, _ = _ring_fwd_loop(q, k, v, scale, causal, axis_name, axis_size)
    return out


def _ring_fwd_loop(q, k, v, scale, causal, axis_name, axis_size):
    idx = lax.axis_index(axis_name)
    b, h, nq, d = q.shape
    nk = k.shape[2]
    q_pos = _positions(idx, nq, axis_size)
    perm = _ring_perm(axis_size)

    # accumulators derived from q so their varying-manual-axes type matches
    # the shard_map inputs (lax.cond requires branch outputs to agree)
    zero_col = q[..., :1].astype(jnp.float32) * 0.0
    m = zero_col + _NEG
    l = zero_col
    acc = q.astype(jnp.float32) * 0.0
    k_blk, v_blk = k, v

    for step in range(axis_size):
        src = (idx - step) % axis_size
        k_pos = _positions(src, nk, axis_size)

        def _visit(args, k_blk=k_blk, v_blk=v_blk, k_pos=k_pos):
            m, l, acc = args
            s, keep = _block_scores(q, k_blk, scale, causal, q_pos, k_pos)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            if keep is not None:
                p = jnp.where(keep, p, 0.0)
            corr = jnp.exp(jnp.maximum(m - m_new, _NEG))
            l2 = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32,
            )
            return m_new, l2, acc * corr + pv

        if causal and nq == nk:
            # blocks entirely in the future contribute nothing; skip the
            # matmuls but keep the ring transfer moving
            m, l, acc = lax.cond(
                src <= idx, _visit, lambda args: args, (m, l, acc)
            )
        else:
            m, l, acc = _visit((m, l, acc))

        if step < axis_size - 1:
            k_blk, v_blk = lax.ppermute(
                (k_blk, v_blk), axis_name, perm
            )

    out = (acc / jnp.maximum(l, 1e-37)).astype(q.dtype)
    return out, m, l


def _ring_fwd(q, k, v, scale, causal, axis_name, axis_size):
    out, m, l = _ring_fwd_loop(q, k, v, scale, causal, axis_name, axis_size)
    return out, (q, k, v, out, m, l)


def _ring_bwd(scale, causal, axis_name, axis_size, residuals, g):
    q, k, v, out, m, l = residuals
    idx = lax.axis_index(axis_name)
    b, h, nq, d = q.shape
    nk = k.shape[2]
    q_pos = _positions(idx, nq, axis_size)
    perm = _ring_perm(axis_size)
    l_safe = jnp.maximum(l, 1e-37)

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
            s, keep = _block_scores(q, k_blk, scale, causal, q_pos, k_pos)
            p = jnp.exp(s - m) / l_safe  # exact normalized weights
            if keep is not None:
                p = jnp.where(keep, p, 0.0)
            dv2 = dv_blk + jnp.einsum(
                "bhqk,bhqd->bhkd", p, do, preferred_element_type=jnp.float32
            )
            dp = jnp.einsum(
                "bhqd,bhkd->bhqk", do, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta) * jnp.float32(scale)
            dq2 = dq + jnp.einsum(
                "bhqk,bhkd->bhqd", ds, k_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            dk2 = dk_blk + jnp.einsum(
                "bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return dq2, dk2, dv2

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

    return jax.shard_map(
        _local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
