"""Tests for classification metrics vs hand-computed values."""

import numpy as np
import pytest

from mmlearn_tpu.modules.metrics.classification import (
    _binary_auroc,
    macro_auroc,
    macro_f1,
    macro_precision,
    macro_recall,
    top_k_accuracy,
)


def test_top_k_accuracy():
    scores = np.asarray([[0.9, 0.1, 0.0], [0.2, 0.3, 0.5], [0.4, 0.5, 0.1]])
    targets = np.asarray([0, 2, 0])
    assert top_k_accuracy(scores, targets, 1) == pytest.approx(2 / 3)
    assert top_k_accuracy(scores, targets, 2) == pytest.approx(1.0)


def test_macro_prf():
    preds = np.asarray([0, 0, 1, 1, 1])
    targets = np.asarray([0, 1, 1, 1, 0])
    # class 0: tp=1 fp=1 fn=1 → p=0.5 r=0.5 f1=0.5
    # class 1: tp=2 fp=1 fn=1 → p=2/3 r=2/3 f1=2/3
    assert macro_precision(preds, targets, 2) == pytest.approx((0.5 + 2 / 3) / 2)
    assert macro_recall(preds, targets, 2) == pytest.approx((0.5 + 2 / 3) / 2)
    assert macro_f1(preds, targets, 2) == pytest.approx((0.5 + 2 / 3) / 2)


def test_binary_auroc_perfect_and_random():
    scores = np.asarray([0.1, 0.2, 0.8, 0.9])
    labels = np.asarray([0, 0, 1, 1])
    assert _binary_auroc(scores, labels) == pytest.approx(1.0)
    assert _binary_auroc(-scores, labels) == pytest.approx(0.0)
    # ties → 0.5
    assert _binary_auroc(np.ones(4), labels) == pytest.approx(0.5)
    # degenerate: single class → None
    assert _binary_auroc(scores, np.zeros(4)) is None


def test_macro_auroc_matches_sklearn_style():
    rng = np.random.default_rng(0)
    targets = rng.integers(0, 3, 60)
    scores = rng.standard_normal((60, 3))
    scores[np.arange(60), targets] += 2.0  # informative scores
    auc = macro_auroc(scores, targets, 3)
    assert 0.85 < auc <= 1.0
