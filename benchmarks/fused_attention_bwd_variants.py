"""Kernel-variant experiments for the fused short-seq MHA *backward*.

The production bwd (ops/fused_attention._bwd_kernel) recomputes scores and
runs 5 batched matmuls at ~40 TF/s — small (N=197, D=64) matmuls underfill
the 128-lane MXU output. Variants probed here:

- ``base``: the production kernel as-is (group sweep).
- ``merged``: dv and dk share a contraction pattern (contract query rows);
  concatenate [p; ds] and [do; q] into one 2U-batch dot_general — fewer,
  longer MXU instruction streams at the cost of a VMEM concat.
- ``pad256``: pad N 197→256 so every matmul dim is tile-aligned.
- ``wide``: pack the D-outputs of dq and dv side by side as (N, 2D)=128
  lanes via block-diagonal rhs (2x K-dim zero padding — tests whether lane
  fill beats the wasted FLOPs).

Usage (on TPU): python benchmarks/fused_attention_bwd_variants.py
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

from mmlearn_tpu.ops.fused_attention import (  # noqa: E402
    _bwd_pallas,
    _fwd_pallas,
)

B, N, H, D = 256, 197, 12, 64
SCALE = D**-0.5

_B_NN = (((2,), (2,)), ((0,), (0,)))
_B_ND = (((2,), (1,)), ((0,), (0,)))
_B_TD = (((1,), (1,)), ((0,), (0,)))


def timeit(fn, *args, iters=20):
    for _ in range(3):
        out = fn(*args)
    float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jnp.asarray(out, jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _stack(qkv_ref, g, hg, d):
    qs, ks, vs = [], [], []
    for gi in range(g):
        for hh in range(hg):
            base = hh * 3 * d
            qs.append(qkv_ref[gi, :, base : base + d])
            ks.append(qkv_ref[gi, :, base + d : base + 2 * d])
            vs.append(qkv_ref[gi, :, base + 2 * d : base + 3 * d])
    return jnp.stack(qs), jnp.stack(ks), jnp.stack(vs)


def _unstack_dqkv(dq, dk, dv, dqkv_ref, g, hg, d):
    u = 0
    for gi in range(g):
        for hh in range(hg):
            base = hh * 3 * d
            dqkv_ref[gi, :, base : base + d] = dq[u].astype(dqkv_ref.dtype)
            dqkv_ref[gi, :, base + d : base + 2 * d] = dk[u].astype(
                dqkv_ref.dtype
            )
            dqkv_ref[gi, :, base + 2 * d : base + 3 * d] = dv[u].astype(
                dqkv_ref.dtype
            )
            u += 1


def _softmax_stats(q, k):
    s = jax.lax.dot_general(q, k, _B_NN, preferred_element_type=jnp.float32)
    s = s * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    return e / l


def bwd_kernel_variant(variant, g, hg=2):
    d = D

    def kernel(qkv_ref, o_ref, do_ref, dqkv_ref):
        q, k, v = _stack(qkv_ref, g, hg, d)
        dos, outs = [], []
        for gi in range(g):
            for hh in range(hg):
                dos.append(do_ref[gi, :, hh * d : (hh + 1) * d])
                outs.append(o_ref[gi, :, hh * d : (hh + 1) * d])
        do = jnp.stack(dos)
        out = jnp.stack(outs)
        p = _softmax_stats(q, k)
        delta = jnp.sum(
            do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
            keepdims=True,
        )
        dp = jax.lax.dot_general(
            do, v, _B_NN, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * SCALE
        dsc = ds.astype(q.dtype)
        if variant == "merged":
            lhs = jnp.concatenate([p.astype(do.dtype), dsc], axis=0)
            rhs = jnp.concatenate([do, q], axis=0)
            both = jax.lax.dot_general(
                lhs, rhs, _B_TD, preferred_element_type=jnp.float32
            )
            u = p.shape[0]
            dv, dk = both[:u], both[u:]
        else:
            dv = jax.lax.dot_general(
                p.astype(do.dtype), do, _B_TD,
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                dsc, q, _B_TD, preferred_element_type=jnp.float32
            )
        dq = jax.lax.dot_general(
            dsc, k, _B_ND, preferred_element_type=jnp.float32
        )
        _unstack_dqkv(dq, dk, dv, dqkv_ref, g, hg, d)

    return kernel


def run_variant(variant, g, hg=2):
    n = N
    grid = (B // g, H // hg)
    kernel = bwd_kernel_variant(variant, g, hg)
    spec3 = pl.BlockSpec((g, n, hg * 3 * D), lambda bi, h: (bi, 0, h),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((g, n, hg * D), lambda bi, h: (bi, 0, h),
                         memory_space=pltpu.VMEM)

    def run(qkv, out, do):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec3, spec1, spec1],
            out_specs=spec3,
            out_shape=jax.ShapeDtypeStruct((B, n, 3 * H * D), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
        )(qkv, out, do)

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, N, 3 * H * D)).astype(np.float32),
        jnp.bfloat16,
    )
    do = jnp.asarray(
        rng.standard_normal((B, N, H * D)).astype(np.float32), jnp.bfloat16
    )
    out = _fwd_pallas(qkv, None, H, SCALE, False)

    # production path reference
    prod = jax.jit(
        lambda qkv, out, do: _bwd_pallas(qkv, None, out, do, H, SCALE, False)
    )
    dt = timeit(prod, qkv, out, do)
    flops = 5 * 2 * N * N * D * H * B
    print(f"production bwd: {dt*1e3:6.2f} ms  ({flops/dt/1e12:5.1f} TF/s)",
          flush=True)

    for variant in ["base", "merged"]:
        for g in [4, 8, 16]:
            try:
                fn = run_variant(variant, g)
                dt = timeit(fn, qkv, out, do)
                print(
                    f"{variant:8s} g={g:2d}: {dt*1e3:6.2f} ms "
                    f"({flops/dt/1e12:5.1f} TF/s)", flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"{variant:8s} g={g:2d}: FAILED {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
