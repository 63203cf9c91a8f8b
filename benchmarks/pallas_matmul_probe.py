"""Probe: can a Pallas-resident matmul match XLA at attention-sublayer shapes?

Gate for the attention-SUBLAYER fusion experiment (VERDICT r4 / roadmap):
folding LN1+qkv-matmul (prologue) and proj+residual (epilogue) into the
fused-MHA kernel removes ~620 MB of HBM round-trips per block per pass
(~18 ms/step over 12 blocks x fwd+remat-recompute at 819 GB/s), but moves
the qkv/proj matmuls (5.7 TFLOP/step total) from XLA fusions measured at
~160 TF/s into Mosaic. Break-even in-kernel matmul rate:

    5.7 TF / (5.7 TF/160 TF/s + 18 ms saved) ≈ 128 TF/s
    win condition (+5% = +16.5 ms)           ≈ 155 TF/s

This probe measures the in-kernel matmuls the sublayer kernel would run —
the full (B*N, 768) activation against the qkv (768x2304) and proj
(768x768) weights, tiled over a row grid whose block sizes are what the
sublayer kernel's VMEM budget allows (g samples x 197 tokens per program)
— and prints achieved TF/s vs the same matmul through XLA. Both sides run
CHAINED inside one jit (methodology rule: per-dispatch tunnel latency
~2 ms swamps sub-ms kernels — see docs/performance.md). If Pallas lands
well under the bar, the sublayer kernel loses before it is written —
record the result and stop.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, C = 256, 197, 768  # flagship step: ViT-B/16 @ b256
CHAIN = 8


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pallas_matmul_rows(x, w, m_blk):
    """Row-grid matmul: one (m_blk, k) x (k, n) dot per program, w invariant."""
    m, k = x.shape
    _, n = w.shape
    assert m % m_blk == 0
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // m_blk,),
        in_specs=[
            pl.BlockSpec((m_blk, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_blk, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, w)


def pallas_matmul_2d(x, w, m_blk, n_blk):
    """2-D grid: w split over n so the weight block fits small VMEM."""
    m, k = x.shape
    _, n = w.shape
    assert m % m_blk == 0 and n % n_blk == 0
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // m_blk, n // n_blk),
        in_specs=[
            pl.BlockSpec((m_blk, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, n_blk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m_blk, n_blk), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, w)


def _chained(mm, x, w, k):
    """Chain CHAIN matmuls with a real data dependence (out slice -> next x)."""

    @jax.jit
    def run(x, w):
        def body(x, _):
            o = mm(x, w)
            return x + o[:, :k] * jnp.bfloat16(1e-3), None

        x, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return x

    return run


def _time(fn, *args, iters=5):
    out = fn(*args)
    # d2h sync fence (tunneled PJRT block_until_ready can return early)
    float(jnp.sum(out[..., :1]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[..., :1]))
        times.append((time.perf_counter() - t0) / iters / CHAIN)
    return statistics.median(times)


def main() -> None:
    rng = np.random.default_rng(0)
    results: dict[str, object] = {}
    for name, n in (("qkv", 3 * C), ("proj", C)):
        w = jnp.asarray(rng.standard_normal((C, n)) * 0.02, jnp.bfloat16)
        # rows padded to the sublayer kernel's padded group tiles
        # (g samples x 197 tokens, padded to a multiple of 8 rows)
        for g in (2, 4, 8):
            m_blk = -(-g * N // 8) * 8
            rows = B * N - (B * N) % m_blk
            x = jnp.asarray(
                rng.standard_normal((rows, C)) * 0.1, jnp.bfloat16
            )
            flops = 2 * rows * C * n
            # row grid (weight block whole; may exceed VMEM when n=2304)
            vmem = 2 * 2 * (m_blk * C + C * n + m_blk * n) + 4 * m_blk * n
            key = f"pallas_{name}_rows_g{g}"
            if vmem > 15 * 2**20:
                results[key] = "vmem_gate"
            else:
                sec = _time(
                    _chained(
                        functools.partial(pallas_matmul_rows, m_blk=m_blk),
                        x, w, C,
                    ),
                    x, w,
                )
                results[key] = round(flops / sec / 1e12, 1)
            # 2-D grid, n split into 768-wide weight blocks
            sec = _time(
                _chained(
                    functools.partial(pallas_matmul_2d, m_blk=m_blk, n_blk=C),
                    x, w, C,
                ),
                x, w,
            )
            results[f"pallas_{name}_2d_g{g}"] = round(flops / sec / 1e12, 1)
        # XLA at the identical full shape, identically chained
        x = jnp.asarray(rng.standard_normal((B * N, C)) * 0.1, jnp.bfloat16)
        sec = _time(_chained(lambda a, b: a @ b, x, w, C), x, w)
        results[f"xla_{name}"] = round(2 * B * N * C * n / sec / 1e12, 1)
    print(json.dumps({"metric": "pallas_sublayer_matmul_probe_tflops",
                      **results}))


if __name__ == "__main__":
    main()
