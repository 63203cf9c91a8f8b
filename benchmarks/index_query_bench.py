"""Serving-index query throughput: top-k similarity over N stored vectors.

The query path a production retrieval deployment runs against
:class:`mmlearn_tpu.serving.EmbeddingIndex` — one (B, D) @ (D, N) matmul +
``lax.top_k`` per chunk, entirely on device. The reference's equivalent is
FAISS ``IndexFlatIP`` on host CPU (bioscan eval_task.py:232-240).

Usage: ``python benchmarks/index_query_bench.py [--rows 1000000]
[--dim 512] [--batch 1024] [--k 10]``. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu._platform import force_platform_from_env

force_platform_from_env()
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from mmlearn_tpu.serving import EmbeddingIndex

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = EmbeddingIndex(emb)
    queries = emb[rng.integers(0, args.rows, args.batch)]

    def measure(approx):
        scores, ids = index.query(queries, k=args.k, approx=approx)  # compile
        assert scores.shape == (args.batch, args.k)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            n_iters = 10
            for _ in range(n_iters):
                scores, ids = index.query(queries, k=args.k, approx=approx)
            # index.query returns numpy — the transfer is the fence
            windows.append(args.batch * n_iters / (time.perf_counter() - t0))
        return statistics.median(windows), windows

    qps, windows = measure(approx=False)
    approx_qps, _ = measure(approx=True)  # TPU-optimized approx_max_k path
    flops = 2.0 * args.batch * args.dim * args.rows
    print(json.dumps({
        "metric": "embedding_index_queries_per_sec",
        "backend": jax.default_backend(),
        "rows": args.rows,
        "dim": args.dim,
        "batch": args.batch,
        "k": args.k,
        "value": round(qps, 1),
        "matmul_tflops_per_sec": round(qps / args.batch * flops / 1e12, 2),
        "approx_queries_per_sec": round(approx_qps, 1),
        "windows": [round(w, 1) for w in windows],
    }))


if __name__ == "__main__":
    main()
