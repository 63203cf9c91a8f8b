"""Kernel-variant experiments for the fused short-seq MHA forward.

Isolates what limits the Pallas kernel at ViT shapes: masking VPU work,
unaligned N=197, score dtype, sample-group size.
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
HG = 2  # heads per program (384-lane blocks)


def timeit(fn, *args, iters=20):
    for _ in range(3):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def make_kernel(use_mask: bool, score_dtype, n: int, g: int):
    d = D

    def kernel(qkv_ref, o_ref):
        for gi in range(g):
            for hh in range(HG):
                base = hh * 3 * d
                q = qkv_ref[gi, :, base : base + d]
                k = qkv_ref[gi, :, base + d : base + 2 * d]
                v = qkv_ref[gi, :, base + 2 * d : base + 3 * d]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=score_dtype,
                ) * jnp.asarray(d**-0.5, score_dtype)
                m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
                p = jnp.exp(s.astype(jnp.float32) - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[gi, :, hh * d : (hh + 1) * d] = o.astype(o_ref.dtype)

    return kernel


def build(variant: str, g: int):
    n = 256 if "pad" in variant else N
    score_dtype = jnp.bfloat16 if "bf16" in variant else jnp.float32
    kernel = make_kernel("mask" in variant, score_dtype, n, g)

    def run(qkv):
        if n != qkv.shape[1]:
            qkv = jnp.pad(qkv, ((0, 0), (0, n - qkv.shape[1]), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(B // g, H // HG),
            in_specs=[
                pl.BlockSpec((g, n, HG * 3 * D), lambda bi, h: (bi, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, n, HG * D), lambda bi, h: (bi, 0, h),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n, H * D), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
        )(qkv)
        return out[:, :N]

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, N, 3 * H * D)).astype(np.float32), jnp.bfloat16
    )
    flops = 4 * B * H * N * N * D
    for variant in ["plain", "pad", "bf16", "pad_bf16"]:
        for g in [4, 8, 16]:
            try:
                fn = build(variant, g)
                dt = timeit(fn, qkv)
                print(
                    f"{variant:10s} g={g:2d}: {dt*1e3:6.2f} ms "
                    f"({flops/dt/1e12:5.1f} TF/s)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"{variant:10s} g={g:2d}: FAILED {str(e)[:80]}")


if __name__ == "__main__":
    main()
