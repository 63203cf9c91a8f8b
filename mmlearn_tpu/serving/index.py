"""Similarity serving over exported embedding shards.

Closes the serving loop: ``EmbeddingExport`` writes ``.npz`` shards +
manifest, :class:`EmbeddingIndex` loads them and answers top-k similarity
queries with an on-device chunked matmul + ``jax.lax.top_k`` — the same
inner-product search FAISS ``IndexFlatIP`` performs for the reference's
bioscan eval (/root/reference/projects/bioscan_clip/eval_task.py:232-240),
running on the accelerator instead of a CPU library.

Usage::

    index = EmbeddingIndex.load("index_dir/", modality="rgb")
    scores, ids = index.query(query_embeddings, k=5)
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# module import (not value import): TOPK_BLOCK / TOPK_SIM_BYTES_BUDGET are
# tunable knobs — reading them through the module keeps one source of truth
from mmlearn_tpu.modules.metrics import retrieval_recall as _rr
from mmlearn_tpu.modules.metrics.retrieval_recall import (
    _blockwise_topk_scores_chunk,
    _topk_scores_chunk,
    _use_blockwise_topk,
)

import functools


@functools.partial(jax.jit, static_argnums=(2,))
def _approx_topk_scores_chunk(queries, targets, k):
    """TPU-optimized approximate MIPS (``jax.lax.approx_max_k``): the
    hardware top-k path, ~recall 0.95 by default — the standard
    serving-side trade for large corpora. Exact on CPU (falls back)."""
    sim = jnp.einsum(
        "qd,td->qt",
        queries,
        targets,
        preferred_element_type=jnp.float32,
        # see metrics/retrieval_recall._topk_scores_chunk: bf16-precision
        # matmul (the TPU f32 default) scrambles rank order among
        # near-duplicate embeddings
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.approx_max_k(sim, k)


class EmbeddingIndex:
    """Flat inner-product index over exported embedding shards."""

    def __init__(
        self,
        embeddings: np.ndarray,
        example_index: Optional[np.ndarray] = None,
        dataset_index: Optional[np.ndarray] = None,
        normalized: bool = True,
    ) -> None:
        self.embeddings = jnp.asarray(np.asarray(embeddings, np.float32))
        n = self.embeddings.shape[0]
        self.example_index = (
            np.arange(n) if example_index is None else np.asarray(example_index)
        )
        self.dataset_index = (
            np.zeros(n, np.int64) if dataset_index is None
            else np.asarray(dataset_index)
        )
        self.normalized = normalized

    def __len__(self) -> int:
        return int(self.embeddings.shape[0])

    @classmethod
    def load(
        cls, index_dir: str, modality: str, dedup: bool = True
    ) -> "EmbeddingIndex":
        """Load every shard of one modality (all processes' manifests).

        ``dedup`` drops repeated ``(dataset_index, example_index)`` rows —
        the safety net for multi-host exports that ran without a
        distributed eval sampler (every process saw the full corpus).
        """
        manifests = sorted(
            f for f in os.listdir(index_dir)
            if f.startswith("manifest") and f.endswith(".json")
        )
        if not manifests:
            raise FileNotFoundError(f"no manifest*.json in {index_dir}")
        embs, ex_idx, ds_idx = [], [], []
        norm_flags = {}
        for mf in manifests:
            meta = json.load(open(os.path.join(index_dir, mf)))
            if modality not in meta:
                continue
            norm_flags[mf] = bool(meta[modality].get("normalized", True))
            for shard in meta[modality]["shards"]:
                z = np.load(os.path.join(index_dir, shard))
                embs.append(z["embeddings"].astype(np.float32))
                ex_idx.append(z["example_index"])
                ds_idx.append(z["dataset_index"])
        if not embs:
            raise ValueError(f"no '{modality}' shards listed in {manifests}")
        if len(set(norm_flags.values())) > 1:
            raise ValueError(
                "manifests disagree on 'normalized' — cosine and raw "
                f"inner-product shards cannot be merged: {norm_flags}"
            )
        emb = np.concatenate(embs)
        ex = np.concatenate(ex_idx)
        ds = np.concatenate(ds_idx)
        if dedup:
            _, keep = np.unique(
                np.stack([ds.astype(np.int64), ex.astype(np.int64)]),
                axis=1, return_index=True,
            )
            if len(keep) < len(ex):
                keep = np.sort(keep)
                emb, ex, ds = emb[keep], ex[keep], ds[keep]
        return cls(emb, ex, ds, normalized=next(iter(norm_flags.values())))

    def query(
        self,
        queries: np.ndarray,
        k: int = 10,
        chunk_size: int = 8192,
        approx: bool = False,
        block_size: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, example ids) per query row.

        Queries should be L2-normalized iff the index is (cosine vs raw
        inner product). Chunked over queries to bound device memory.
        ``approx=True`` uses the TPU-optimized ``jax.lax.approx_max_k``
        (recall ≈ 0.95; exact on CPU) — the standard large-corpus trade.

        Exact queries whose (chunk, corpus) f32 similarity matrix would
        blow the HBM budget stream over corpus blocks instead (per-block
        ``top_k`` + merge — still exact, sim never materializes whole).
        Memory-routed because that is also the throughput order on a v5e
        (1M x 512, k=10): full-axis wins while its sim fits (6,214 vs
        5,665 q/s at 1024 queries); blockwise at the native chunk beats
        full-axis at the largest feasible chunk once it doesn't (7,179 vs
        7,003 q/s at 8192 queries — the native full-axis sim would be
        32 GB). ``block_size`` forces blockwise with that block length.
        """
        k = min(int(k), len(self))
        q = jnp.asarray(np.asarray(queries, np.float32))
        scores, rows = [], []
        for start in range(0, q.shape[0], chunk_size):
            qc = q[start : start + chunk_size]
            forced = (
                block_size is not None and len(self) > block_size >= k
            )
            if approx:
                s, i = _approx_topk_scores_chunk(qc, self.embeddings, k)
            elif forced or _use_blockwise_topk(qc.shape[0], len(self), k):
                # an unusable block_size (>= corpus, or < k: per-block top_k
                # needs k <= block) falls back to the MEMORY routing, not to
                # an unconditional full-axis sim — a corpus past the HBM
                # budget must stream regardless of the requested block
                s, i = _blockwise_topk_scores_chunk(
                    qc, self.embeddings, k,
                    block_size if forced else _rr.TOPK_BLOCK,
                )
            else:
                s, i = _topk_scores_chunk(qc, self.embeddings, k)
            scores.append(np.asarray(s))
            rows.append(np.asarray(i))
        rows_np = np.concatenate(rows)
        return np.concatenate(scores), self.example_index[rows_np]
