"""Evaluation metrics."""

from mmlearn_tpu.modules.metrics.retrieval_recall import RetrievalRecallAtK

__all__ = ["RetrievalRecallAtK"]
