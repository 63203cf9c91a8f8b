"""Embedding export: write encoder outputs to disk as a retrieval index.

The production *serving* workload of a contrastive model is embedding
export — encoding a corpus once and serving similarity queries against the
stored vectors. The reference has no export path (its closest analogue is
re-encoding inside each eval task, e.g.
/root/reference/mmlearn/tasks/zero_shot_retrieval.py:100-113); this task
makes export a first-class ``eval_task`` so ``mmlearn_run job_type=eval``
can materialize an index:

    mmlearn_run job_type=eval +experiment=... \\
        'task.evaluation_tasks.export.task._target_=mmlearn_tpu.tasks.EmbeddingExport' \\
        'task.evaluation_tasks.export.task.modalities=[rgb]' \\
        'task.evaluation_tasks.export.task.output_dir=${runtime.output_dir}/index'

Design (TPU-first):

- embeddings accumulate **on device** (one jitted encode per batch, no
  per-batch host round-trip) and transfer once per shard flush;
- shards are plain ``.npz`` files (embeddings + example/dataset indices +
  validity) — loadable anywhere, no serving-stack dependency;
- multi-host runs write disjoint per-process shards (the eval sampler
  already gives each process a disjoint slice); a ``manifest.json`` per
  process records shard paths, row counts, and the embedding dim.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.constants import (
    DATASET_INDEX_KEY,
    EXAMPLE_INDEX_KEY,
    MODALITY_PRESENCE_SUFFIX,
)
from mmlearn_tpu.datasets.core.modalities import Modalities
from mmlearn_tpu.tasks.hooks import EvalRuntime, EvaluationHooks


@store(group="eval_task", name="EmbeddingExport", populate_full_signature=False)
class EmbeddingExport(EvaluationHooks):
    """Write per-modality embedding shards for downstream serving.

    Args:
        modalities: which modalities to export (default: all the task has).
        output_dir: directory for shards + manifest (created if missing).
        normalize: L2-normalize embeddings (the similarity-serving layout).
        shard_size: rows per ``.npz`` shard; bounds peak device/host memory.
        dtype: on-disk dtype (``float32`` or ``float16``; .npz has no
            bfloat16 — raw unnormalized features can overflow f16, so the
            narrowing is explicit, never silent).
    """

    def __init__(
        self,
        output_dir: str,
        modalities: Optional[Sequence[str]] = None,
        normalize: bool = True,
        shard_size: int = 65536,
        dtype: str = "float32",
    ) -> None:
        self.output_dir = output_dir
        if modalities is not None and not list(modalities):
            raise ValueError(
                "EmbeddingExport: modalities=[] exports nothing; pass None "
                "to export every modality in the batch"
            )
        self.modalities = (
            [str(m).lower() for m in modalities] if modalities is not None
            else None
        )
        self.normalize = bool(normalize)
        self.shard_size = int(shard_size)
        if dtype not in ("float32", "float16"):
            raise ValueError(
                f"EmbeddingExport dtype must be float32 or float16, got {dtype!r}"
            )
        self.dtype = np.dtype(dtype)
        self._buffers: dict[str, list] = {}
        self._manifest: dict[str, Any] = {}
        self._consumed: dict[str, int] = {}

    # -- hooks -------------------------------------------------------------

    def on_evaluation_epoch_start(self, runtime: EvalRuntime) -> None:
        self._buffers = {}
        self._consumed = {}
        mods = self.modalities or [str(m).lower() for m in runtime.task.modalities]
        self._manifest = {
            m: {"shards": [], "rows": 0, "dim": None, "normalized": self.normalize}
            for m in mods
        }
        os.makedirs(self.output_dir, exist_ok=True)
        import jax

        if jax.process_count() > 1:
            import logging

            logging.getLogger(__name__).warning(
                "EmbeddingExport on %d processes: shards are per-process; "
                "disjoint coverage requires a distributed eval sampler "
                "(DistributedEvalSampler). EmbeddingIndex.load dedups "
                "(dataset_index, example_index) pairs as a safety net.",
                jax.process_count(),
            )

    def evaluation_step(
        self, runtime: EvalRuntime, batch: Mapping[str, Any], batch_idx: int
    ) -> None:
        for mod in self._manifest:
            key = Modalities.get_modality(mod).name
            if key not in batch:
                continue
            from mmlearn_tpu.parallel.collectives import (
                process_local_rows,
                process_local_rows_device,
            )

            emb = process_local_rows_device(
                runtime.encode(batch, mod, normalize=self.normalize)
            )
            n = emb.shape[0]
            valid = np.ones(n, dtype=bool)
            pk = f"{key}{MODALITY_PRESENCE_SUFFIX}"
            if pk in batch:
                valid &= process_local_rows(batch[pk]).astype(bool)
            if "batch_validity" in batch:
                valid &= process_local_rows(batch["batch_validity"]).astype(bool)
            if EXAMPLE_INDEX_KEY in batch:
                ex_idx = process_local_rows(batch[EXAMPLE_INDEX_KEY]).reshape(-1)[:n]
            else:
                # datasets that don't stamp indices: consumption order,
                # globally unique across batches
                seen = self._consumed.get(mod, 0)
                ex_idx = np.arange(seen, seen + n)
            self._consumed[mod] = self._consumed.get(mod, 0) + n
            ds_idx = process_local_rows(
                batch.get(DATASET_INDEX_KEY, np.zeros(n, np.int64))
            ).reshape(-1)[:n]
            buf = self._buffers.setdefault(mod, [])
            # device-resident until flush: store the jnp array, not np
            buf.append((emb, valid, ex_idx, ds_idx))
            if sum(b[0].shape[0] for b in buf) >= self.shard_size:
                self._flush(mod)

    def on_evaluation_epoch_end(self, runtime: EvalRuntime) -> dict[str, Any]:
        results: dict[str, Any] = {}
        for mod in list(self._manifest):
            if self._buffers.get(mod):
                self._flush(mod)
            m = self._manifest[mod]
            results[f"export/{mod}_rows"] = m["rows"]
        import jax

        suffix = f"_p{jax.process_index()}" if jax.process_count() > 1 else ""
        path = os.path.join(self.output_dir, f"manifest{suffix}.json")
        with open(path, "w") as f:
            json.dump(self._manifest, f, indent=2)
        self._buffers = {}
        return results

    # -- internals ---------------------------------------------------------

    def _flush(self, mod: str) -> None:
        buf = self._buffers.pop(mod, [])
        if not buf:
            return
        # single device→host transfer for the whole shard
        emb = np.asarray(jnp.concatenate([b[0] for b in buf], axis=0)).astype(
            self.dtype
        )
        valid = np.concatenate([b[1] for b in buf])
        ex_idx = np.concatenate([b[2] for b in buf])
        ds_idx = np.concatenate([b[3] for b in buf])
        # padded/absent rows never reach disk
        emb, ex_idx, ds_idx = emb[valid], ex_idx[valid], ds_idx[valid]
        import jax

        m = self._manifest[mod]
        suffix = f"_p{jax.process_index()}" if jax.process_count() > 1 else ""
        name = f"{mod}{suffix}_{len(m['shards']):05d}.npz"
        np.savez(
            os.path.join(self.output_dir, name),
            embeddings=emb,
            example_index=ex_idx,
            dataset_index=ds_idx,
        )
        m["shards"].append(name)
        m["rows"] += int(emb.shape[0])
        m["dim"] = int(emb.shape[1])
