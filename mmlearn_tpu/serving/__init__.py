"""Serving: compiled, self-describing encoder artifacts.

The reference has no deployment story beyond re-importing the training code
(its eval path re-instantiates the LightningModule —
/root/reference/mmlearn/cli/run.py:145-146). Here the serving unit is an
exported encoder: StableHLO via ``jax.export`` (batch-polymorphic, multi-
platform) plus a msgpack weights bundle — loadable without the model's
Python class, pinned against training-code drift.
"""

from mmlearn_tpu.serving.export import (
    export_encoder,
    load_encoder,
    save_encoder,
)
from mmlearn_tpu.serving.index import EmbeddingIndex

__all__ = ["EmbeddingIndex", "export_encoder", "load_encoder", "save_encoder"]
