"""Zero-shot cross-modal retrieval evaluation.

Parity: /root/reference/mmlearn/tasks/zero_shot_retrieval.py — per
``(query_modality, target_modality, top_k)`` spec builds Recall@K metrics
(reference lines 57-72), per batch encodes both modalities un-normalized and
updates with arange positive indexes (lines 100-113), epoch-end
compute/log/reset (lines 115-143).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.constants import MODALITY_PRESENCE_SUFFIX
from mmlearn_tpu.datasets.core.modalities import Modalities
from mmlearn_tpu.modules.metrics.retrieval_recall import RetrievalRecallAtK
from mmlearn_tpu.tasks.hooks import EvalRuntime, EvaluationHooks


@dataclass
class RetrievalTaskSpec:
    """Reference: ``RetrievalTaskSpec`` (zero_shot_retrieval.py)."""

    query_modality: str = "rgb"
    target_modality: str = "text"
    top_k: Sequence[int] = field(default_factory=lambda: [10])


@store(group="eval_task", name="ZeroShotCrossModalRetrieval", populate_full_signature=False)
class ZeroShotCrossModalRetrieval(EvaluationHooks):
    """Recall@K for each configured cross-modal retrieval direction."""

    def __init__(self, task_specs: Sequence[RetrievalTaskSpec | Mapping]) -> None:
        self.task_specs = [
            spec if isinstance(spec, RetrievalTaskSpec) else RetrievalTaskSpec(**spec)
            for spec in task_specs
        ]
        # ONE metric per direction: all k cutoffs share the accumulated
        # embeddings and a single similarity pass (compute_many)
        self._ks: dict[tuple, list[int]] = {}
        for spec in self.task_specs:
            q = str(spec.query_modality).lower()
            t = str(spec.target_modality).lower()
            merged = self._ks.setdefault((q, t), [])
            merged.extend(int(k) for k in spec.top_k)
        self.metrics: dict[tuple, RetrievalRecallAtK] = {
            pair: RetrievalRecallAtK(top_k=max(ks))
            for pair, ks in self._ks.items()
        }

    def on_evaluation_epoch_start(self, runtime: EvalRuntime) -> None:
        for metric in self.metrics.values():
            metric.reset()

    def evaluation_step(
        self, runtime: EvalRuntime, batch: Mapping[str, Any], batch_idx: int
    ) -> None:
        cache: dict[str, Any] = {}
        for (q, t), metric in self.metrics.items():
            q_key = Modalities.get_modality(q).name
            t_key = Modalities.get_modality(t).name
            if q_key not in batch or t_key not in batch:
                continue
            for mod in (q, t):
                if mod not in cache:
                    from mmlearn_tpu.parallel.collectives import (
                        process_local_rows_device,
                    )

                    # stays device-resident: the metric accumulates device
                    # buffers and transfers once at epoch end; multihost
                    # batches reduce to this process's rows first
                    cache[mod] = process_local_rows_device(
                        runtime.encode(batch, mod, normalize=False)
                    )
            from mmlearn_tpu.parallel.collectives import process_local_rows

            valid = np.ones(len(cache[q]), dtype=bool)
            for key in (q_key, t_key):
                pk = f"{key}{MODALITY_PRESENCE_SUFFIX}"
                if pk in batch:
                    valid &= process_local_rows(batch[pk]).astype(bool)
            if "batch_validity" in batch:
                valid &= process_local_rows(batch["batch_validity"]).astype(bool)
            metric.update(cache[q], cache[t], indexes=None, valid=valid)

    def on_evaluation_epoch_end(self, runtime: EvalRuntime) -> dict[str, float]:
        results = {}
        for (q, t), metric in self.metrics.items():
            recalls = metric.compute_many(self._ks[(q, t)])
            for k, value in recalls.items():
                results[f"retrieval/{q}_to_{t}_R@{k}"] = value
            metric.reset()
        return results
