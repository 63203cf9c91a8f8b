"""Experiment: interleave independent unit sub-batches in the fused MHA kernel.

The current kernels run ONE dependence chain per program:
``s(all U) -> softmax(all U) -> pv(all U)`` — each stage is a single (batched)
op, so the MXU idles during the VPU softmax and vice versa. Splitting the U
units into independent halves gives the Mosaic scheduler two overlapping
chains: unit-half B's score matmul can run while half A is in its softmax.

Usage (on TPU): python benchmarks/fused_attention_interleave.py
Prints ms + achieved TF/s per variant for fwd and bwd at ViT-B/16 shapes.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, H, D = 256, 197, 12, 64
HG = 2
SCALE = D ** -0.5

_BATCH_NN = (((2,), (2,)), ((0,), (0,)))
_BATCH_ND = (((2,), (1,)), ((0,), (0,)))
_BATCH_TD = (((1,), (1,)), ((0,), (0,)))


CHAIN = 12  # kernel calls chained per jit — amortizes tunneled dispatch


def timeit(fn, *args, iters=10):
    """Time one kernel call, measured as a CHAIN-long dependence chain
    inside a single jit (per-dispatch latency on tunneled PJRT runtimes
    otherwise swamps sub-ms kernels)."""
    for _ in range(3):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters / CHAIN


def _stack(qkv_ref, g, hg):
    qs, ks, vs = [], [], []
    for gi in range(g):
        for hh in range(hg):
            base = hh * 3 * D
            qs.append(qkv_ref[gi, :, base : base + D])
            ks.append(qkv_ref[gi, :, base + D : base + 2 * D])
            vs.append(qkv_ref[gi, :, base + 2 * D : base + 3 * D])
    return jnp.stack(qs), jnp.stack(ks), jnp.stack(vs)


def _fwd_chain(q, k, v):
    s = jax.lax.dot_general(
        q, k, _BATCH_NN, preferred_element_type=jnp.float32
    ) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        (p / l).astype(v.dtype), v, _BATCH_ND,
        preferred_element_type=jnp.float32,
    )


def fwd_kernel(qkv_ref, o_ref, *, g, splits):
    q, k, v = _stack(qkv_ref, g, HG)
    u_total = g * HG
    step = u_total // splits
    outs = []
    for si in range(splits):
        sl = slice(si * step, (si + 1) * step)
        outs.append(_fwd_chain(q[sl], k[sl], v[sl]))
    o = jnp.concatenate(outs, axis=0) if splits > 1 else outs[0]
    u = 0
    for gi in range(g):
        for hh in range(HG):
            o_ref[gi, :, hh * D : (hh + 1) * D] = o[u].astype(o_ref.dtype)
            u += 1


def _bwd_chain(q, k, v, do, out):
    s = jax.lax.dot_general(
        q, k, _BATCH_NN, preferred_element_type=jnp.float32
    ) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, _BATCH_TD, preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, _BATCH_NN, preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * SCALE
    dsc = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsc, k, _BATCH_ND, preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        dsc, q, _BATCH_TD, preferred_element_type=jnp.float32
    )
    return dq, dk, dv


def bwd_kernel(qkv_ref, o_ref, do_ref, dqkv_ref, *, g, splits):
    q, k, v = _stack(qkv_ref, g, HG)
    dos, outs = [], []
    for gi in range(g):
        for hh in range(HG):
            dos.append(do_ref[gi, :, hh * D : (hh + 1) * D])
            outs.append(o_ref[gi, :, hh * D : (hh + 1) * D])
    do = jnp.stack(dos)
    out = jnp.stack(outs)
    u_total = g * HG
    step = u_total // splits
    dqs, dks, dvs = [], [], []
    for si in range(splits):
        sl = slice(si * step, (si + 1) * step)
        dq, dk, dv = _bwd_chain(q[sl], k[sl], v[sl], do[sl], out[sl])
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    cat = (lambda xs: jnp.concatenate(xs, axis=0) if splits > 1 else xs[0])
    dq, dk, dv = cat(dqs), cat(dks), cat(dvs)
    u = 0
    for gi in range(g):
        for hh in range(HG):
            base = hh * 3 * D
            dqkv_ref[gi, :, base : base + D] = dq[u].astype(dqkv_ref.dtype)
            dqkv_ref[gi, :, base + D : base + 2 * D] = dk[u].astype(
                dqkv_ref.dtype
            )
            dqkv_ref[gi, :, base + 2 * D : base + 3 * D] = dv[u].astype(
                dqkv_ref.dtype
            )
            u += 1


def run_fwd(g, splits):
    grid = (B // g, H // HG)
    spec_qkv = pl.BlockSpec((g, N, HG * 3 * D), lambda b, h: (b, 0, h),
                            memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((g, N, HG * D), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(fwd_kernel, g=g, splits=splits),
        grid=grid,
        in_specs=[spec_qkv],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )

    @jax.jit
    def chained(qkv):
        def body(qkv, _):
            o = fn(qkv)
            # cheap dependence: perturb qkv with the output so the chain
            # cannot be CSE'd or reordered
            qkv = qkv + jnp.tile(o, (1, 1, 3)) * jnp.bfloat16(1e-3)
            return qkv, None
        qkv, _ = jax.lax.scan(body, qkv, None, length=CHAIN)
        return qkv

    return chained


def run_bwd(g, splits):
    grid = (B // g, H // HG)
    spec_qkv = pl.BlockSpec((g, N, HG * 3 * D), lambda b, h: (b, 0, h),
                            memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((g, N, HG * D), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(bwd_kernel, g=g, splits=splits),
        grid=grid,
        in_specs=[spec_qkv, spec_o, spec_o],
        out_specs=spec_qkv,
        out_shape=jax.ShapeDtypeStruct((B, N, H * 3 * D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )

    @jax.jit
    def chained(qkv, out, do):
        def body(qkv, _):
            dqkv = fn(qkv, out, do)
            qkv = qkv + dqkv * jnp.bfloat16(1e-3)
            return qkv, None
        qkv, _ = jax.lax.scan(body, qkv, None, length=CHAIN)
        return qkv

    return chained


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, N, H * 3 * D)) * 0.1, jnp.bfloat16
    )
    out = jnp.asarray(rng.standard_normal((B, N, H * D)) * 0.1, jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((B, N, H * D)) * 0.1, jnp.bfloat16)

    fwd_flops = 2 * 2 * B * H * N * N * D
    bwd_flops = 5 * 2 * B * H * N * N * D

    for g in [4, 8]:
        for splits in [1, 2, 4]:
            if (g * HG) % splits:
                continue
            try:
                dt = timeit(run_fwd(g, splits), qkv)
                print(
                    f"fwd g={g} splits={splits}: {dt*1e3:6.2f} ms "
                    f"{fwd_flops/dt/1e12:6.1f} TF/s", flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"fwd g={g} splits={splits}: FAILED {str(e)[:90]}",
                      flush=True)
    for g in [4, 8]:
        for splits in [1, 2, 4]:
            if (g * HG) % splits:
                continue
            try:
                dt = timeit(run_bwd(g, splits), qkv, out, do)
                print(
                    f"bwd g={g} splits={splits}: {dt*1e3:6.2f} ms "
                    f"{bwd_flops/dt/1e12:6.1f} TF/s", flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"bwd g={g} splits={splits}: FAILED {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
