"""Tests for the evaluation stack: recall@k metric + zero-shot tasks."""

import functools

import numpy as np
import pytest

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader, Example
from mmlearn_tpu.modules.encoders import TextTransformer, VisionTransformer
from mmlearn_tpu.modules.metrics import RetrievalRecallAtK
from mmlearn_tpu.tasks import (
    ClassificationTaskSpec,
    ContrastivePretraining,
    EvaluationSpec,
    RetrievalTaskSpec,
    ZeroShotClassification,
    ZeroShotCrossModalRetrieval,
)
from mmlearn_tpu.trainer import Trainer

import optax


def test_recall_at_k_exact():
    rng = np.random.default_rng(0)
    targets = rng.standard_normal((20, 8)).astype(np.float32)
    # queries = noisy copies of targets → R@1 high, R@5 ~1
    queries = targets + 0.01 * rng.standard_normal((20, 8)).astype(np.float32)
    m1 = RetrievalRecallAtK(top_k=1)
    m1.update(queries[:10], targets[:10])
    m1.update(queries[10:], targets[10:])  # auto index offsetting
    assert m1.compute() == 1.0

    # adversarial: query 0 matches target 1
    m = RetrievalRecallAtK(top_k=1)
    q = np.eye(4, dtype=np.float32)
    t = np.roll(np.eye(4, dtype=np.float32), 1, axis=0)
    m.update(q, t)
    assert m.compute() == 0.0
    m5 = RetrievalRecallAtK(top_k=4)
    m5.update(q, t)
    assert m5.compute() == 1.0


def test_recall_at_k_blockwise_routing_matches_full_axis(monkeypatch):
    """Queries whose (chunk, targets) sim matrix exceeds the HBM budget
    stream over target blocks (per-block top_k + merge — the large-corpus
    memory path); the recall must equal the full-axis computation
    exactly."""
    from mmlearn_tpu.modules.metrics import retrieval_recall as rr

    rng = np.random.default_rng(1)
    targets = rng.standard_normal((50, 8)).astype(np.float32)
    queries = targets + 0.3 * rng.standard_normal((50, 8)).astype(np.float32)

    def recall(k):
        m = RetrievalRecallAtK(top_k=k)
        m.update(queries, targets)
        return m.compute()

    full = {k: recall(k) for k in (1, 5)}
    monkeypatch.setattr(rr, "TOPK_SIM_BYTES_BUDGET", 0)  # every sim "too big"
    monkeypatch.setattr(rr, "TOPK_BLOCK", 8)  # 50 targets -> 7 blocks
    blocked = {k: recall(k) for k in (1, 5)}
    assert blocked == full
    # k > block falls back to the full-axis kernel (per-block top_k needs
    # k <= block) and still agrees
    monkeypatch.setattr(rr, "TOPK_BLOCK", 4)
    m = RetrievalRecallAtK(top_k=5)
    m.update(queries, targets)
    assert m.compute() == full[5]


def test_recall_at_k_validity_mask():
    q = np.eye(4, dtype=np.float32)
    m = RetrievalRecallAtK(top_k=1)
    valid = np.asarray([True, True, False, False])
    m.update(q, q, valid=valid)
    assert m.compute() == 1.0
    assert len(m._queries[0]) == 2  # padded rows dropped


class PairedEvalDataset:
    """Paired data + classification metadata for zero-shot eval."""

    zero_shot_prompt_templates = ["a photo of {}.", "an image of {}."]
    id2label = {0: "zero", 1: "one", 2: "two", 3: "three"}

    def __init__(self, size=32, img=16, seed=0):
        rng = np.random.default_rng(seed)
        self.size, self.img = size, img
        self.labels = rng.integers(0, 4, size)
        # patterns come from a fixed independent stream so train/val splits
        # of any size share the same 4 class patterns — the test measures
        # eval-pipeline correctness (alignment), not 4-pattern generalization
        self.patterns = np.random.default_rng(1234).standard_normal(
            (4, img, img, 3)
        ).astype(np.float32)

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        k = int(self.labels[idx])
        ids = np.full((8,), k + 2, dtype=np.int32)
        ids[0], ids[-1] = 1, 30
        return Example(
            {
                "rgb": self.patterns[k],
                "rgb_target": k,
                "text": ids,
                "text_attention_mask": np.ones(8, np.int32),
                EXAMPLE_INDEX_KEY: idx,
            }
        )


class FakeTokenizer:
    """Maps prompt strings to deterministic token ids (class-keyed)."""

    def __init__(self, labels):
        self.vocab = {lbl: i + 2 for i, lbl in enumerate(labels)}

    def __call__(self, prompts):
        ids = np.ones((len(prompts), 8), np.int32)
        for i, p in enumerate(prompts):
            for lbl, tok in self.vocab.items():
                if lbl in p:
                    ids[i, 1:-1] = tok
        ids[:, -1] = 30
        return {"text": ids, "text_attention_mask": np.ones((len(prompts), 8), np.int32)}


def _task_with_eval():
    encoders = {
        "rgb": VisionTransformer(
            img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
            use_cls_token=True, global_pool="cls", proj_dim=16,
        ),
        "text": TextTransformer(
            vocab_size=32, max_length=8, embed_dim=32, depth=2, num_heads=4,
            causal=True, pooling="eos", proj_dim=16,
        ),
    }
    retrieval = ZeroShotCrossModalRetrieval(
        task_specs=[
            RetrievalTaskSpec("rgb", "text", top_k=[1, 5]),
            RetrievalTaskSpec("text", "rgb", top_k=[5]),
        ]
    )
    classification = ZeroShotClassification(
        task_specs=[ClassificationTaskSpec("rgb", top_k=[1, 2])],
        tokenizer=FakeTokenizer(list(PairedEvalDataset.id2label.values())),
    )
    return ContrastivePretraining(
        encoders=encoders,
        optimizer=functools.partial(optax.adamw, learning_rate=3e-3,
                                    weight_decay=0.0),
        evaluation_tasks={
            "retrieval": EvaluationSpec(task=retrieval),
            "classification": EvaluationSpec(task=classification),
        },
    )


@pytest.mark.integration_test
def test_zero_shot_eval_pipeline():
    train_ds = CombinedDataset([PairedEvalDataset(size=64)])
    val_ds = CombinedDataset([PairedEvalDataset(size=32, seed=0)])
    train_loader = DataLoader(train_ds, batch_size=16, shuffle=True, drop_last=True)
    val_loader = DataLoader(val_ds, batch_size=16, pad_partial_batches=True)

    task = _task_with_eval()
    trainer = Trainer(
        max_steps=120, log_every_n_steps=30, seed=0,
        default_root_dir="/tmp/mmlearn_test_eval",
    )
    trainer.fit(task, train_loader)
    results = trainer.validate(task, val_loader)

    assert "validation/loss" in results
    assert "retrieval/rgb_to_text_R@1" in results
    assert "retrieval/rgb_to_text_R@5" in results
    assert "retrieval/text_to_rgb_R@5" in results
    assert "classification/ds0_rgb_top1_accuracy" in results
    # 4 classes × duplicated patterns: the exact positive competes with ~8
    # identical-embedding targets, so R@5 is bounded well below 1 even for a
    # perfect model — just require well above chance (5/32 ≈ 0.16)
    assert results["retrieval/rgb_to_text_R@5"] > 0.25
    assert results["classification/ds0_rgb_top2_accuracy"] >= 0.5
    assert results["classification/ds0_rgb_top1_accuracy"] >= 0.25


class PairedEvalDatasetB(PairedEvalDataset):
    """Second eval dataset with its own label space (2 classes)."""

    zero_shot_prompt_templates = ["an x-ray of {}."]
    id2label = {0: "zero", 1: "one"}

    def __init__(self, size=16, img=16, seed=5):
        super().__init__(size=size, img=img, seed=seed)
        self.labels = self.labels % 2


@pytest.mark.integration_test
def test_zero_shot_classification_multi_dataset_routing():
    """Examples route to their own dataset's class embeddings by
    dataset_index (reference: zero_shot_classification.py:195-219)."""
    train_ds = CombinedDataset([PairedEvalDataset(size=32)])
    val_ds = CombinedDataset(
        [PairedEvalDataset(size=16, seed=0), PairedEvalDatasetB(size=16)]
    )
    task = _task_with_eval()
    trainer = Trainer(
        max_steps=10, log_every_n_steps=5, seed=0,
        default_root_dir="/tmp/mmlearn_test_multi_ds_eval",
    )
    trainer.fit(task, DataLoader(train_ds, batch_size=16, drop_last=True))
    results = trainer.validate(
        task, DataLoader(val_ds, batch_size=8, pad_partial_batches=True)
    )
    # both datasets produce their own metric rows; ds1 is 2-class so it
    # takes the binary softmax-difference path (reference
    # zero_shot_classification.py:208-214, 252-261): plain accuracy, no top-k
    assert "classification/ds0_rgb_top1_accuracy" in results
    assert "classification/ds1_rgb_accuracy" in results
    assert "classification/ds1_rgb_top1_accuracy" not in results
    assert "classification/ds1_rgb_auroc" in results
    assert 0.0 <= results["classification/ds1_rgb_accuracy"] <= 1.0
    for v in results.values():
        assert np.isfinite(v)


def test_binary_softmax_difference_matches_torch_reference_formula():
    """The binary zero-shot scores must match the reference computation
    softmax(q @ C^T)[:, 1] - softmax(q @ C^T)[:, 0]
    (reference zero_shot_classification.py:208-214) bit-for-bit on the same
    float32 inputs."""
    import torch

    rng = np.random.default_rng(0)
    q = rng.standard_normal((37, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c = rng.standard_normal((2, 16)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)

    # our path (as implemented in ZeroShotClassification.evaluation_step)
    raw = q @ c.T
    ex = np.exp(raw - raw.max(axis=1, keepdims=True))
    sm = ex / ex.sum(axis=1, keepdims=True)
    ours = sm[:, 1] - sm[:, 0]

    t = torch.softmax(torch.from_numpy(q) @ torch.from_numpy(c).T, dim=-1)
    theirs = (t[:, 1] - t[:, 0]).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)

    # binary decision threshold: sigmoid(score) > 0.5 <=> score > 0 matches
    # torchmetrics task="binary" preds semantics
    preds = (ours > 0).astype(np.int64)
    assert set(np.unique(preds)) <= {0, 1}


def test_merge_gathered_shards_offsets_indexes():
    """Multihost Recall@K merge: per-process positive indexes are offset by
    the cumulative target counts of preceding processes (the reference
    rank-offsets inside update, retrieval_recall.py:140-161)."""
    from mmlearn_tpu.modules.metrics.retrieval_recall import (
        _merge_gathered_shards,
    )

    d = 4
    # process 0: 2 queries / 3 targets; process 1: 1 query / 2 targets (padded)
    counts = np.array([[2, 3], [1, 2]])
    gq = np.zeros((2, 2, d)); gq[0, :2] = 1.0; gq[1, :1] = 2.0
    gt = np.zeros((2, 3, d)); gt[0, :3] = 3.0; gt[1, :2] = 4.0
    gi = np.zeros((2, 2), np.int64)
    gi[0, :2] = [0, 2]   # local target rows on process 0
    gi[1, :1] = [1]      # local target row on process 1
    q, t, idx = _merge_gathered_shards(gq, gt, gi, counts)
    assert q.shape == (3, d) and t.shape == (5, d)
    # process-1 indexes offset by process-0's 3 targets
    np.testing.assert_array_equal(idx, [0, 2, 4])
    # padding rows dropped
    assert (t[3:] == 4.0).all() and (t[:3] == 3.0).all()


def test_recall_at_k_mid_batch_invalid_rows():
    """Auto-generated positive indexes must be positions among the *stored*
    (valid-compacted) targets: an invalid row BEFORE a valid one must not
    shift later queries off their positives."""
    q = np.eye(4, dtype=np.float32)
    m = RetrievalRecallAtK(top_k=1)
    valid = np.asarray([False, True, False, True])
    m.update(q, q, valid=valid)
    # queries 1 and 3 kept; each matches its own (compacted) target row
    assert m.compute() == 1.0

    # across batches: the offset counts stored targets, not raw rows
    # (disjoint rows per batch — duplicate targets would tie the top-1)
    q8 = np.eye(8, dtype=np.float32)
    m2 = RetrievalRecallAtK(top_k=1)
    m2.update(q8[:4], q8[:4], valid=np.asarray([False, True, True, True]))
    m2.update(q8[4:], q8[4:], valid=np.asarray([True, False, True, False]))
    assert m2.compute() == 1.0
