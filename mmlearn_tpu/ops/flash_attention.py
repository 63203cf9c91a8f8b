"""Fused multi-head attention for TPU (Pallas flash-attention kernel).

Replaces the reference's naive O(N²)-materializing attention
(/root/reference/mmlearn/modules/layers/attention.py:59-75) with an online-
softmax kernel: logits never hit HBM; running max / normalizer / accumulator
live in VMEM scratch while the kv loop streams K/V blocks through the MXU.

Differentiation: ``flash_attention`` is a ``jax.custom_vjp`` whose backward
recomputes attention with plain XLA ops (flash-style recompute — no residual
softmax is stored). At mmlearn sequence lengths (196-512 tokens) the backward
matmuls dominate and XLA fuses them well; a Pallas backward kernel is a
planned follow-up optimization.

Dispatch: the Pallas path runs on TPU; on CPU (tests) the mathematically
identical XLA path runs instead (the kernel itself is also unit-tested via
``interpret=True``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU-only installs too, but guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
    causal: bool,
) -> jax.Array:
    """Reference XLA attention (numerics-matching fallback path).

    ``MMLEARN_ATTN_LOGITS=bf16`` keeps the score matrix in bfloat16 (halves
    the largest intermediate's HBM traffic; softmax max/denominator still
    accumulate in f32 inside jax.nn.softmax's reductions). Default f32.
    """
    import os

    bf16_scores = (
        os.environ.get("MMLEARN_ATTN_LOGITS", "f32") == "bf16"
        and q.dtype == jnp.bfloat16
    )
    pref = jnp.bfloat16 if bf16_scores else jnp.float32
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=pref) * jnp.asarray(
        scale, pref
    )
    neg = jnp.asarray(DEFAULT_MASK_VALUE if pref == jnp.float32 else -3e38, pref)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, neg)
    if causal:
        n_q, n_k = s.shape[-2], s.shape[-1]
        causal_mask = jnp.tril(jnp.ones((n_q, n_k), dtype=bool), n_k - n_q)
        s = jnp.where(causal_mask, s, neg)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _flash_kernel(
    mask_ref,  # (1, 1, block_k) bool
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    o_ref,  # (1, block_q, d)
    lse_ref,  # (1, 1, block_q) f32
    m_scratch,  # (block_q, LANES) f32
    l_scratch,  # (block_q, LANES) f32
    acc_scratch,  # (block_q, d) f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    def _compute():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)

        kv_mask = mask_ref[0, 0]  # (bk,) bool
        s = jnp.where(kv_mask[None, :], s, DEFAULT_MASK_VALUE)
        if causal:
            row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(row >= col, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...][:, :1]  # (bq, 1)
        l_prev = l_scratch[...][:, :1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)  # (bq, 1)
        l_cur = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        m_scratch[...] = jnp.broadcast_to(m_cur, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_cur, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    if causal:
        # Skip fully-masked kv blocks above the diagonal.
        first_masked_k_block = (i * block_q + block_q + block_k - 1) // block_k

        @pl.when(j < first_masked_k_block)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(j == n_k - 1)
    def _finalize():
        m = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)
        # logsumexp per row, saved for the backward kernels
        lse = m + jnp.log(safe_l)
        lse_ref[0, 0] = lse[:, 0]


def _flash_forward_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    block_q = min(block_q, max(_pad_to(n_q, 8), 8))
    block_k = min(block_k, max(_pad_to(n_k, 8), 8))

    pq = _pad_to(n_q, block_q)
    pk = _pad_to(n_k, block_k)
    if pq != n_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq - n_q), (0, 0)))
    if pk != n_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk - n_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk - n_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pk - n_k)))

    qr = q.reshape(b * h, pq, d)
    kr = k.reshape(b * h, pk, d)
    vr = v.reshape(b * h, pk, d)
    # (B, 1, pk) so the trailing block dims satisfy TPU tiling constraints
    mask3 = mask.reshape(b, 1, pk)

    grid = (b * h, pq // block_q, pk // block_k)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bh, i, j, h=h: (bh // h, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, d), lambda bh, i, j: (bh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda bh, i, j: (bh, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda bh, i, j: (bh, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda bh, i, j: (bh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q), lambda bh, i, j: (bh, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, pq, d), out_dtype or q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, pq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
        if _HAS_PLTPU
        else [],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
        if (_HAS_PLTPU and not interpret)
        else None,
    )(mask3, qr, kr, vr)
    out, lse = out
    out = out.reshape(b, h, pq, d)
    return out[:, :, :n_q, :], lse


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _bwd_dkv_kernel(
    mask_ref,  # (1, 1, block_k)
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    do_ref,  # (1, block_q, d)
    lse_ref,  # (1, 1, block_q) f32
    delta_ref,  # (1, 1, block_q) f32
    dk_ref,  # (1, block_k, d)
    dv_ref,  # (1, block_k, d)
    dk_scratch,  # (block_k, d) f32
    dv_scratch,  # (block_k, d) f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    j = pl.program_id(1)  # kv block
    i = pl.program_id(2)  # q block (innermost)
    n_q = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0].astype(jnp.float32)[:, None]  # (bq, 1)
        delta = delta_ref[0, 0].astype(jnp.float32)[:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)
        kv_mask = mask_ref[0, 0]
        s = jnp.where(kv_mask[None, :], s, DEFAULT_MASK_VALUE)
        if causal:
            row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(row >= col, s, DEFAULT_MASK_VALUE)

        p = jnp.exp(s - lse)  # (bq, bk)
        dv_scratch[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dk_scratch[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # q block contributes only if its last row can see this kv block
        @pl.when(i * block_q + block_q - 1 >= j * block_k)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(i == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    mask_ref,  # (1, 1, block_k)
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    do_ref,  # (1, block_q, d)
    lse_ref,  # (1, 1, block_q)
    delta_ref,  # (1, 1, block_q)
    dq_ref,  # (1, block_q, d)
    dq_scratch,  # (block_q, d) f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    i = pl.program_id(1)  # q block
    j = pl.program_id(2)  # kv block (innermost)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0].astype(jnp.float32)[:, None]
        delta = delta_ref[0, 0].astype(jnp.float32)[:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        kv_mask = mask_ref[0, 0]
        s = jnp.where(kv_mask[None, :], s, DEFAULT_MASK_VALUE)
        if causal:
            row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(row >= col, s, DEFAULT_MASK_VALUE)

        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dq_scratch[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        @pl.when(j * block_k <= i * block_q + block_q - 1)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(j == n_k - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[...].astype(dq_ref.dtype)


def _flash_backward_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    out: jax.Array,
    lse: jax.Array,  # (B*H, 1, pq) f32
    g: jax.Array,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    block_q = min(block_q, max(_pad_to(n_q, 8), 8))
    block_k = min(block_k, max(_pad_to(n_k, 8), 8))
    pq = _pad_to(n_q, block_q)
    pk = _pad_to(n_k, block_k)

    # delta = rowsum(dout * out) — tiny elementwise pass in XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (b, h, n_q)
    if pq != n_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq - n_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pq - n_q), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pq - n_q)))
    if pk != n_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk - n_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk - n_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pk - n_k)))

    qr = q.reshape(b * h, pq, d)
    kr = k.reshape(b * h, pk, d)
    vr = v.reshape(b * h, pk, d)
    gr = g.reshape(b * h, pq, d)
    delta3 = delta.reshape(b * h, 1, pq)
    mask3 = mask.reshape(b, 1, pk)

    common_params = dict(
        scale=scale, causal=causal, block_q=block_q, block_k=block_k
    )
    compiler = (
        pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
        if (_HAS_PLTPU and not interpret)
        else None
    )

    # dk/dv: grid (BH, n_kv_blocks, n_q_blocks), q innermost
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common_params),
        grid=(b * h, pk // block_k, pq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bh, j, i, h=h: (bh // h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, j, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, j, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, pk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, pk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ]
        if _HAS_PLTPU
        else [],
        interpret=interpret,
        compiler_params=compiler,
    )(mask3, qr, kr, vr, gr, lse, delta3)

    # dq: grid (BH, n_q_blocks, n_kv_blocks), kv innermost
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common_params),
        grid=(b * h, pq // block_q, pk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bh, i, j, h=h: (bh // h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j: (bh, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, pq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)]
        if _HAS_PLTPU
        else [],
        interpret=interpret,
        compiler_params=compiler,
    )(mask3, qr, kr, vr, gr, lse, delta3)

    dq = dq.reshape(b, h, pq, d)[:, :, :n_q, :]
    dk = dk.reshape(b, h, pk, d)[:, :, :n_k, :]
    dv = dv.reshape(b, h, pk, d)[:, :, :n_k, :]
    return dq, dk, dv


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def _flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    force_xla: bool,
) -> jax.Array:
    if force_xla or not _use_pallas():
        return _attention_xla(q, k, v, mask, scale, causal)
    out, _ = _flash_forward_pallas(
        q, k, v, mask, scale, causal, block_q, block_k, interpret=False
    )
    return out


def _flash_fwd(q, k, v, mask, scale, causal, block_q, block_k, force_xla):
    if force_xla or not _use_pallas():
        out = _attention_xla(q, k, v, mask, scale, causal)
        return out, (q, k, v, mask, None, None)
    out, lse = _flash_forward_pallas(
        q, k, v, mask, scale, causal, block_q, block_k, interpret=False
    )
    return out, (q, k, v, mask, out, lse)


def _flash_bwd(scale, causal, block_q, block_k, force_xla, residuals, g):
    q, k, v, mask, out, lse = residuals
    if lse is None:  # XLA fwd path → XLA recompute bwd
        def _recompute(q, k, v):
            return _attention_xla(q, k, v, mask, scale, causal)

        _, vjp = jax.vjp(_recompute, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    dq, dk, dv = _flash_backward_pallas(
        q, k, v, mask, out, lse, g, scale, causal, block_q, block_k,
        interpret=False,
    )
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    force_xla: bool = False,
    min_kv_seq_for_pallas: Optional[int] = None,
) -> jax.Array:
    """Multi-head scaled dot-product attention.

    Dispatch (measured on v5e, CLIP ViT-B/16 shapes): at short sequences
    (mmlearn's 77-257 tokens) XLA's batched-matmul attention beats the
    blocked kernel — the per-head tiles are too small to fill the MXU from a
    Pallas grid, and XLA's autodiff keeps the softmax residuals instead of
    recomputing. The Pallas kernel takes over at ``kv_seq >=
    min_kv_seq_for_pallas`` where the O(N²) logits no longer fit comfortably
    in HBM traffic budgets (flash recompute wins).

    Args:
        q, k, v: ``(batch, heads, seq, head_dim)`` arrays.
        mask: optional ``(batch, kv_seq)`` boolean key-validity mask
            (True = attend). Padding-token masking for text encoders.
        scale: logit scale; defaults to ``head_dim**-0.5``.
        causal: apply a causal mask (CLIP text towers are causal).
        force_xla: bypass the Pallas kernel (debug/tests).
    """
    if q.ndim != 4:
        raise ValueError(f"Expected (B, H, N, D) inputs, got {q.shape}")
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if min_kv_seq_for_pallas is None:
        import os

        # measured v5e crossover: XLA wins ≤4096 (both paths are HBM-bound
        # and XLA fuses better); the flash kernel wins at 16384 (59 vs 65 ms
        # fwd+bwd) and keeps memory flat where XLA's f32 logits OOM
        min_kv_seq_for_pallas = int(
            os.environ.get("MMLEARN_FLASH_MIN_SEQ", "8192")
        )
    if mask is not None:
        mask = mask.astype(bool)
        if mask.ndim != 2:
            raise ValueError(f"mask must be (batch, kv_seq), got {mask.shape}")
    if (
        force_xla
        or not _use_pallas()
        or k.shape[2] < min_kv_seq_for_pallas
    ):
        # plain XLA path with native autodiff (saves the recompute)
        return _attention_xla(q, k, v, mask, float(scale), causal)
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    return _flash_attention(
        q, k, v, mask, float(scale), causal, block_q, block_k, False
    )


def flash_attention_interpret(q, k, v, mask=None, *, scale=None, causal=False):
    """Run the Pallas kernel in interpreter mode (CPU correctness tests)."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    out, _ = _flash_forward_pallas(
        q, k, v, mask.astype(bool), float(scale), causal, 128, 128, interpret=True
    )
    return out
