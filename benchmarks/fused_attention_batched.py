"""Experiment: batched dot_general inside the fused-MHA kernel.

Hypothesis: the per-(sample, head) loop of small (197,64) matmuls is
pipeline-fill dominated; stacking units into one batched dot_general per
program may let Mosaic pipeline the MXU better.
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


def timeit(fn, *args, iters=20):
    for _ in range(3):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def loop_kernel(qkv_ref, o_ref, *, g):
    for gi in range(g):
        for hh in range(HG):
            base = hh * 3 * D
            q = qkv_ref[gi, :, base : base + D]
            k = qkv_ref[gi, :, base + D : base + 2 * D]
            v = qkv_ref[gi, :, base + 2 * D : base + 3 * D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (D**-0.5)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[gi, :, hh * D : (hh + 1) * D] = o.astype(o_ref.dtype)


def batched_kernel(qkv_ref, o_ref, *, g):
    # stack units (g*HG, N, D) then one batched dot_general pair
    qs, ks, vs = [], [], []
    for gi in range(g):
        for hh in range(HG):
            base = hh * 3 * D
            qs.append(qkv_ref[gi, :, base : base + D])
            ks.append(qkv_ref[gi, :, base + D : base + 2 * D])
            vs.append(qkv_ref[gi, :, base + 2 * D : base + 3 * D])
    q = jnp.stack(qs)  # (U, N, D)
    k = jnp.stack(ks)
    v = jnp.stack(vs)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (D**-0.5)  # (U, N, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (U, N, D)
    u = 0
    for gi in range(g):
        for hh in range(HG):
            o_ref[gi, :, hh * D : (hh + 1) * D] = o[u].astype(o_ref.dtype)
            u += 1


def build(kernel_fn, g):
    kernel = functools.partial(kernel_fn, g=g)

    def run(qkv):
        return pl.pallas_call(
            kernel,
            grid=(B // g, H // HG),
            in_specs=[
                pl.BlockSpec((g, N, HG * 3 * D), lambda bi, h: (bi, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, N, HG * D), lambda bi, h: (bi, 0, h),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, H * D), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
        )(qkv)

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, N, 3 * H * D)).astype(np.float32), jnp.bfloat16
    )
    flops = 4 * B * H * N * N * D
    for name, kfn in [("loop", loop_kernel), ("batched", batched_kernel)]:
        for g in [4, 8]:
            try:
                dt = timeit(build(kfn, g), qkv)
                print(f"{name:8s} g={g}: {dt*1e3:6.2f} ms "
                      f"({flops/dt/1e12:5.1f} TF/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:8s} g={g}: FAILED {str(e)[:90]}")


if __name__ == "__main__":
    main()
