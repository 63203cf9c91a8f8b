"""Go/no-go probe: int8 vs bf16 dot_general throughput at model shapes.

v5e datasheet: 197 bf16 TFLOP/s vs 394 int8 TOPS. If XLA reaches ~2x on the
flagship's matmul shapes, an int8-forward Dense (AQT-style) is worth
building; if not, skip it (the quantize/dequantize overhead would eat the
margin).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

CHAIN = 8

# (rows, in, out) for the flagship's main matmuls
SHAPES = [
    (256 * 197, 768, 2304),   # vision qkv
    (256 * 197, 768, 3072),   # vision fc1
    (256 * 197, 3072, 768),   # vision fc2
    (256 * 77, 512, 2048),    # text fc1
    (8192, 8192, 8192),       # square reference point
]


def bench(m, k, n, dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, dtype)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, dtype)
        acc = jnp.float32

    @jax.jit
    def chained(x, w):
        def body(x, _):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=acc
            )
            # cheap dependence: fold y back into x's (m, k) shape — tile
            # when n < k (e.g. the 3072->768 fc2 shape)
            if y.shape[1] < k:
                y = jnp.tile(y, (1, (k + y.shape[1] - 1) // y.shape[1]))
            yk = y[:, :k]
            if dtype == jnp.int8:
                x = (x + (yk >> 8).astype(jnp.int8)).astype(jnp.int8)
            else:
                x = x + yk.astype(dtype) * dtype(1e-3)
            return x, None

        x, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return x

    for _ in range(2):
        out = chained(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = chained(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters / CHAIN
    return 2 * m * k * n / dt / 1e12, dt


def main():
    for m, k, n in SHAPES:
        row = f"({m:>6}x{k:>4}x{n:>4})"
        for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.int8, "int8")]:
            try:
                tf, dt = bench(m, k, n, dtype)
                row += f"  {name}: {dt*1e3:6.2f} ms {tf:6.1f} T/s"
            except Exception as e:  # noqa: BLE001
                row += f"  {name}: FAILED {str(e)[:60]}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
