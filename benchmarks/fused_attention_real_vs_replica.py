"""Sanity: time the production fused_mha kernel in a chained-jit harness.

The interleave microbenchmark's replica kernel measured ~3x slower than the
same-shape pallas_call inside the real train step (attn.50 = 0.86 ms/layer).
This script times the *production* kernel (ops/fused_attention.py) under the
identical chained harness to locate the discrepancy (replica bug vs harness
overhead vs train-step context).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmlearn_tpu.ops.fused_attention import fused_mha  # noqa: E402

B, N, H, D = 256, 197, 12, 64
CHAIN = 12


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, N, H * 3 * D)) * 0.1, jnp.bfloat16
    )

    @jax.jit
    def chained(qkv):
        def body(qkv, _):
            o = fused_mha(qkv, num_heads=H)
            qkv = qkv + jnp.tile(o, (1, 1, 3)) * jnp.bfloat16(1e-3)
            return qkv, None

        qkv, _ = jax.lax.scan(body, qkv, None, length=CHAIN)
        return qkv

    # also time the dependence-op-only loop to subtract harness cost
    @jax.jit
    def harness_only(qkv):
        def body(qkv, _):
            o = qkv[..., : H * D]
            qkv = qkv + jnp.tile(o, (1, 1, 3)) * jnp.bfloat16(1e-3)
            return qkv, None

        qkv, _ = jax.lax.scan(body, qkv, None, length=CHAIN)
        return qkv

    for name, fn in [("fused_mha", chained), ("harness", harness_only)]:
        for _ in range(3):
            out = fn(qkv)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = fn(qkv)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters / CHAIN
        flops = 2 * 2 * B * H * N * N * D
        print(f"{name}: {dt*1e3:.3f} ms/call  {flops/dt/1e12:.1f} TF/s",
              flush=True)


def profile():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, N, H * 3 * D)) * 0.1, jnp.bfloat16
    )

    @jax.jit
    def chained(qkv):
        def body(qkv, _):
            o = fused_mha(qkv, num_heads=H)
            qkv = qkv + jnp.tile(o, (1, 1, 3)) * jnp.bfloat16(1e-3)
            return qkv, None

        qkv, _ = jax.lax.scan(body, qkv, None, length=CHAIN)
        return qkv

    out = chained(qkv)
    float(jnp.sum(out))
    with jax.profiler.trace("/tmp/mm_kernel_profile"):
        out = chained(qkv)
        float(jnp.sum(out))


if __name__ == "__main__":
    if os.environ.get("MMLEARN_PROFILE") == "1":
        profile()
    else:
        main()
