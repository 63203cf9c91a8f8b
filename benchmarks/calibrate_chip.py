"""Calibrate the real chip through the tunnel: matmul peak, dispatch
overhead, profiler availability.

Run on the ambient (axon) platform. Sync discipline: float() fences only
(see benchmarks/common.py).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fence(x):
    return float(jnp.sum(x))


def bench(fn, arg, iters=20, warmup=3):
    x = arg
    for _ in range(warmup):
        x = fn(x)
    fence(x)
    x = arg
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    fence(x)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())

    # 1) dispatch overhead: trivial chained op
    @jax.jit
    def triv(x):
        return x + 1.0

    x0 = jnp.zeros((8, 8), jnp.float32)
    dt = bench(triv, x0, iters=100)
    print(f"dispatch/chained trivial op: {dt*1e3:.3f} ms/iter")

    # 2) big bf16 matmul peak: chained z = z @ w (8192^3 = 1.1 TF/matmul)
    n = 8192
    w = jnp.ones((n, n), jnp.bfloat16) * 0.001

    @jax.jit
    def mm(z):
        return jnp.tanh(z @ w)  # tanh keeps values bounded

    z0 = jnp.ones((n, n), jnp.bfloat16)
    dt = bench(mm, z0, iters=10)
    tf = 2 * n**3 / dt / 1e12
    print(f"bf16 {n}^3 matmul: {dt*1e3:.2f} ms -> {tf:.1f} TF/s")

    # 3) ViT-shaped matmul: (256*197, 768) @ (768, 3072)
    m, k, nn_ = 256 * 197, 768, 3072
    w2 = jnp.ones((k, nn_), jnp.bfloat16) * 0.001
    w3 = jnp.ones((nn_, k), jnp.bfloat16) * 0.001

    @jax.jit
    def mm2(z):
        return jnp.tanh((z @ w2) @ w3)

    z1 = jnp.ones((m, k), jnp.bfloat16)
    dt = bench(mm2, z1, iters=10)
    tf = (2 * m * k * nn_ * 2) / dt / 1e12
    print(f"ViT MLP-shaped matmul pair: {dt*1e3:.2f} ms -> {tf:.1f} TF/s")

    # 4) HBM bandwidth: big copy-scale
    big = jnp.ones((512, 1024, 1024), jnp.bfloat16)  # 1 GiB

    @jax.jit
    def scale(z):
        return z * 1.0001

    dt = bench(scale, big, iters=10)
    gbps = 2 * big.size * 2 / dt / 1e9
    print(f"HBM stream (1GiB r+w): {dt*1e3:.2f} ms -> {gbps:.0f} GB/s")

    # 5) profiler availability
    try:
        with jax.profiler.trace("/tmp/jax_trace_test"):
            fence(mm(z0))
        import glob

        files = glob.glob("/tmp/jax_trace_test/**/*", recursive=True)
        print(f"profiler: wrote {len(files)} files")
        for f in files[:10]:
            print("  ", f)
    except Exception as e:  # noqa: BLE001
        print("profiler FAILED:", repr(e))


if __name__ == "__main__":
    main()
