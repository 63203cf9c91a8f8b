"""Taxonomic classification evaluation (BIOSCAN-CLIP).

Parity: /root/reference/projects/bioscan_clip/eval_task.py — accumulates
rgb/dna/text (+averaged/concatenated) embeddings per BIOSCAN split, predicts
taxonomy labels for val_seen/val_unseen queries by kNN over the ``all_keys``
gallery, and reports micro + macro top-k accuracy per taxonomy level.

TPU-native change (SURVEY.md §2.9 item 3): FAISS ``IndexFlatIP`` search is an
exact inner-product top-k — replaced by an on-device jitted chunked matmul +
``jax.lax.top_k`` (mmlearn_tpu.modules.metrics.retrieval_recall._topk_chunk).
Host-side gather of string labels uses one ``process_allgather`` at epoch end
instead of per-step ``all_gather_object`` (reference lines 222-229).
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import external_store
from mmlearn_tpu.modules.layers.normalization import l2_normalize
from mmlearn_tpu.modules.metrics.retrieval_recall import _topk_chunk
from mmlearn_tpu.tasks.hooks import EvalRuntime, EvaluationHooks

LEVELS = ("order", "family", "genus", "species")
QUERY_TYPES = ("rgb", "dna", "averaged", "concatenated")
KEY_TYPES = ("rgb", "dna", "averaged", "concatenated", "all_key")


from mmlearn_tpu.parallel.collectives import process_local_rows as _local_rows


def _labels_to_list(labels: Any, n: int) -> list[dict[str, str]]:
    """Normalize collated labels into a list of per-example taxonomy dicts."""
    if isinstance(labels, Mapping):
        return [
            {level: str(labels[level][i]) for level in LEVELS if level in labels}
            for i in range(n)
        ]
    return [dict(d) for d in labels]


def knn_predict(
    queries: np.ndarray,
    keys: np.ndarray,
    key_labels: list[dict[str, str]],
    max_k: int,
    chunk: int = 1024,
) -> list[dict[str, list[str]]]:
    """Exact inner-product kNN labels (replaces faiss.IndexFlatIP search)."""
    q = np.asarray(l2_normalize(jnp.asarray(queries, jnp.float32)))
    t = jnp.asarray(l2_normalize(jnp.asarray(keys, jnp.float32)))
    k = min(max_k, t.shape[0])
    preds: list[dict[str, list[str]]] = []
    for start in range(0, len(q), chunk):
        idx = np.asarray(_topk_chunk(jnp.asarray(q[start : start + chunk]), t, k))
        for row in idx:
            preds.append(
                {
                    level: [key_labels[i][level] for i in row]
                    for level in LEVELS
                }
            )
    return preds


def top_k_micro_accuracy(
    pred_list: Sequence[dict], gt_list: Sequence[dict], k_list: Sequence[int]
) -> dict[int, dict[str, float]]:
    """Fraction of queries whose gt label appears in the top-k predictions."""
    out: dict[int, dict[str, float]] = {}
    for k in k_list:
        out[k] = {}
        for level in LEVELS:
            correct = sum(
                1
                for pred, gt in zip(pred_list, gt_list)
                if gt[level] in pred[level][:k]
            )
            out[k][level] = correct / max(1, len(pred_list))
    return out


def top_k_macro_accuracy(
    pred_list: Sequence[dict], gt_list: Sequence[dict], k_list: Sequence[int]
) -> tuple[dict, dict]:
    """Per-class recall averaged over classes (+ the per-class table)."""
    macro: dict[int, dict[str, float]] = {}
    per_class: dict[int, dict[str, dict[str, float]]] = {}
    for k in k_list:
        macro[k] = {}
        per_class[k] = {}
        for level in LEVELS:
            hit: dict[str, int] = {}
            total: dict[str, int] = {}
            for pred, gt in zip(pred_list, gt_list):
                label = gt[level]
                total[label] = total.get(label, 0) + 1
                if label in pred[level][:k]:
                    hit[label] = hit.get(label, 0) + 1
            per_class[k][level] = {
                label: hit.get(label, 0) / cnt for label, cnt in total.items()
            }
            macro[k][level] = (
                sum(per_class[k][level].values()) / len(total) if total else 0.0
            )
    return macro, per_class


@external_store(group="eval_task", name="TaxonomicClassification",
                populate_full_signature=False)
class TaxonomicClassification(EvaluationHooks):
    """kNN taxonomic classification over BIOSCAN splits."""

    def __init__(
        self,
        top_k: Sequence[int] = (1,),
        query_splits: Sequence[str] = ("val_seen", "val_unseen"),
        key_split: str = "all_keys",
        report_combos: Sequence[Sequence[str]] = (("rgb", "dna"),),
        print_table: bool = True,
    ) -> None:
        self.top_k = [int(k) for k in top_k]
        self.query_splits = list(query_splits)
        self.key_split = key_split
        # only these (query_type, key_type) pairs are computed and reported —
        # the reference computes the full 4x5 grid but reports rgb→dna
        # (reference eval_task.py:193-201); computing unreported combos is
        # wasted eval compute
        self.report_combos = [tuple(c) for c in report_combos]
        #: log a per-level accuracy table at epoch end (process 0 only) —
        #: the reference's rich-table report (eval_task.py:352-404)
        self.print_table = bool(print_table)

    def on_evaluation_epoch_start(self, runtime: EvalRuntime) -> None:
        self._store: dict[str, dict[str, list]] = {}

    def evaluation_step(
        self, runtime: EvalRuntime, batch: Mapping[str, Any], batch_idx: int
    ) -> None:
        required = ("rgb", "dna")
        if any(m not in batch for m in required):
            return
        emb = {
            m: _local_rows(runtime.encode(batch, m, normalize=True))
            for m in ("rgb", "dna", "text")
            if m in batch
        }
        emb["averaged"] = (emb["rgb"] + emb["dna"]) / 2.0
        emb["concatenated"] = np.concatenate([emb["rgb"], emb["dna"]], axis=1)

        splits = batch.get("split")
        n = len(emb["rgb"])
        if splits is None:
            splits = ["no_split"] * n
        labels = _labels_to_list(batch.get("labels", [{}] * n), n)
        valid = _local_rows(
            batch.get("batch_validity", np.ones(n, dtype=bool))
        ).astype(bool)

        for split in set(splits):
            sel = np.asarray([s == split for s in splits]) & valid
            if not sel.any():
                continue
            store = self._store.setdefault(split, {})
            for key, value in emb.items():
                store.setdefault(key, []).append(value[sel])
            sel_labels = [l for l, s in zip(labels, sel) if s]
            store.setdefault("labels", []).extend(sel_labels)
            if split == self.key_split and "text" in emb:
                store.setdefault("all_key", []).append(
                    np.concatenate([emb["rgb"][sel], emb["dna"][sel],
                                    emb["text"][sel]])
                )
                store.setdefault("all_key_labels", []).extend(sel_labels * 3)

    def on_evaluation_epoch_end(self, runtime: EvalRuntime) -> dict[str, float]:
        import jax

        if jax.process_count() > 1:  # pragma: no cover - multihost only
            # every process sees the global store (embeddings + label objects)
            # before scoring, matching the reference's all_gather +
            # all_gather_object (reference eval_task.py:68-92, 222-229)
            from mmlearn_tpu.parallel.collectives import process_allgather_object

            self._store = _merge_stores(process_allgather_object(self._store))
        if not self._store or self.key_split not in self._store:
            return {}
        keys_store = self._store[self.key_split]
        cat = {
            k: np.concatenate(v)
            for k, v in keys_store.items()
            # all_key is concatenated on demand below (it is 3x the gallery)
            if k not in ("labels", "all_key_labels", "all_key")
        }
        key_labels = keys_store["labels"]
        max_k = max(self.top_k)

        results: dict[str, float] = {}
        for split in self.query_splits:
            if split not in self._store:
                continue
            qstore = self._store[split]
            q_emb = {
                k: np.concatenate(v)
                for k, v in qstore.items()
                if k != "labels"
            }
            gt = qstore["labels"]
            for q_type, k_type in self.report_combos:
                if q_type not in q_emb:
                    continue
                if k_type == "all_key":
                    if "all_key" not in keys_store:
                        continue
                    keys = np.concatenate(keys_store["all_key"])
                    k_labels = keys_store["all_key_labels"]
                else:
                    if k_type not in cat:
                        continue
                    keys = cat[k_type]
                    k_labels = key_labels
                if keys.shape[-1] != q_emb[q_type].shape[-1]:
                    continue
                preds = knn_predict(q_emb[q_type], keys, k_labels, max_k)
                micro = top_k_micro_accuracy(preds, gt, self.top_k)
                macro, _ = top_k_macro_accuracy(preds, gt, self.top_k)
                for k in self.top_k:
                    for level in LEVELS:
                        results[
                            f"{split}_{q_type}_2_{k_type}_top_{k}_micro_{level}"
                        ] = micro[k][level]
                        results[
                            f"{split}_{q_type}_2_{k_type}_top_{k}_macro_{level}"
                        ] = macro[k][level]
        self._store.clear()
        if self.print_table and results and jax.process_index() == 0:
            _log_accuracy_table(results, self.top_k)
        return results


def _log_accuracy_table(results: Mapping[str, float], top_k: Sequence[int]) -> None:
    """Compact stdlib rendering of the reference's rich accuracy table
    (reference eval_task.py:352-404): one row per (query→key, acc type, k),
    one column per (split, level)."""
    import logging

    logger = logging.getLogger(__name__)
    # parse keys: {split}_{q}_2_{k}_top_{n}_{micro|macro}_{level}
    parsed = []
    for key, value in results.items():
        m = re.match(
            r"(?P<split>.+)_(?P<q>rgb|dna|text|averaged|concatenated)_2_"
            r"(?P<k>rgb|dna|text|averaged|concatenated|all_key)_top_"
            r"(?P<n>\d+)_(?P<type>micro|macro)_"
            r"(?P<level>order|family|genus|species)$",
            key,
        )
        if m:
            parsed.append((m.groupdict(), value))
    if not parsed:
        return
    splits = sorted({p["split"] for p, _ in parsed})
    rows: dict[tuple, dict] = {}
    for p, value in parsed:
        rows.setdefault(
            (f"{p['q']}→{p['k']}", p["type"], int(p["n"])), {}
        )[(p["split"], p["level"])] = value
    cols = [(s, lv) for s in splits for lv in LEVELS]
    header = " | ".join(f"{s[:6]}.{lv[:4]}" for s, lv in cols)
    lines = [f"{'query→key (acc, k)':34s} | {header}"]
    for (combo, acc_type, k), cells in sorted(rows.items()):
        label = f"{combo} ({acc_type} top-{k})"
        vals = " | ".join(
            f"{cells.get(c, float('nan')):11.4f}" for c in cols
        )
        lines.append(f"{label:34s} | {vals}")
    logger.info("taxonomic classification results:\n%s", "\n".join(lines))


def _merge_stores(stores: Sequence[Mapping[str, Mapping[str, list]]]) -> dict:
    """Merge per-process accumulation stores: per split, concatenate the
    per-key lists in process order (so every process scores the global set)."""
    merged: dict[str, dict[str, list]] = {}
    for store in stores:
        for split, sub in store.items():
            dst = merged.setdefault(split, {})
            for key, items in sub.items():
                dst.setdefault(key, []).extend(items)
    return merged
