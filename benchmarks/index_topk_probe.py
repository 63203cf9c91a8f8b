"""Probe: what dominates the flat-index query at 1M x 512?

The round-4 battery measured EmbeddingIndex.query at 5.8k q/s (b1024,
k=10) with approx_max_k only 10% faster — so either the HIGHEST-precision
score matmul, the (Q, 1M) f32 sim materialization, or lax.top_k
dominates. This probe times each stage separately (chained-jit per the
methodology rules) plus an exact streaming blockwise top-k candidate
(scan over target blocks; per-block top_k + merge; sim never hits HBM
whole). Decides whether/what to optimize in serving/index.py.
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T, D, Q, K = 1_000_000, 512, 1024, 10


def _sim(q, t, precision):
    return jnp.einsum(
        "qd,td->qt", q, t,
        preferred_element_type=jnp.float32, precision=precision,
    )


def matmul_only(q, t, precision):
    # cheap reduction so the (Q, T) sim is consumed without top_k
    return jnp.max(_sim(q, t, precision), axis=1)


def matmul_topk(q, t, precision):
    return jax.lax.top_k(_sim(q, t, precision), K)[0][:, -1]


def matmul_approx(q, t, precision):
    return jax.lax.approx_max_k(_sim(q, t, precision), K)[0][:, -1]


def blockwise(q, t, precision, block):
    n = t.shape[0]
    s = -(-n // block)
    tp = jnp.pad(t, ((0, s * block - n), (0, 0)))
    tb = tp.reshape(s, block, tp.shape[1])

    def body(_, inputs):
        blk, i = inputs
        sim = _sim(q, blk, precision)
        gidx = i * block + jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        sim = jnp.where(gidx < n, sim, -jnp.inf)
        bs, bi = jax.lax.top_k(sim, K)
        return None, (bs, jnp.take_along_axis(gidx, bi, axis=1))

    _, (ss, ii) = jax.lax.scan(body, None, (tb, jnp.arange(s)))
    ss = jnp.moveaxis(ss, 0, 1).reshape(q.shape[0], s * K)
    ii = jnp.moveaxis(ii, 0, 1).reshape(q.shape[0], s * K)
    fs, fi = jax.lax.top_k(ss, K)
    return fs[:, -1] + jnp.take_along_axis(ii, fi, axis=1)[:, -1]


def _time(fn, *args, iters=3):
    out = fn(*args)
    float(jnp.sum(out))  # d2h sync fence (see docs/performance.md)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        times.append((time.perf_counter() - t0) / iters)
    return statistics.median(times)


def main() -> None:
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    qv = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    t /= jnp.linalg.norm(t, axis=1, keepdims=True)
    qv /= jnp.linalg.norm(qv, axis=1, keepdims=True)

    results = {}
    for pname, prec in (
        ("hi", jax.lax.Precision.HIGHEST),
        ("def", jax.lax.Precision.DEFAULT),
    ):
        for name, fn in (
            ("matmul", matmul_only),
            ("topk", matmul_topk),
            ("approx", matmul_approx),
        ):
            sec = _time(jax.jit(functools.partial(fn, precision=prec)), qv, t)
            results[f"{name}_{pname}_ms"] = round(sec * 1e3, 1)
            results[f"{name}_{pname}_qps"] = round(Q / sec, 0)
        for block in (32768, 131072):
            sec = _time(
                jax.jit(functools.partial(
                    blockwise, precision=prec, block=block)),
                qv, t,
            )
            results[f"block{block // 1024}k_{pname}_ms"] = round(sec * 1e3, 1)
            results[f"block{block // 1024}k_{pname}_qps"] = round(Q / sec, 0)
    print(json.dumps({"metric": "index_topk_probe_1m_x_512_b1024", **results}))


if __name__ == "__main__":
    main()
