"""Evaluation hooks protocol.

Parity: /root/reference/mmlearn/tasks/hooks.py (``EvaluationHooks``): a
3-hook protocol driven by the trainer's eval loop. Hooks receive an
:class:`EvalRuntime` instead of a LightningModule: it exposes the task, the
current params, and a jit-cached ``encode`` so metric code never touches
module internals.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def device_batch(batch: Mapping[str, Any]) -> dict[str, Any]:
    """Keep only device-compatible (numeric array) entries of a batch.

    One filter for the trainer's step inputs and the eval runtime's encode
    inputs: recurses into nested mappings and drops object-dtype arrays
    (collated raw strings) that would fail inside ``jax.jit``.
    """
    out: dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, Mapping):
            sub = device_batch(v)
            if sub:
                out[k] = sub
        elif isinstance(v, (np.ndarray, jnp.ndarray, jax.Array)):
            if getattr(v, "dtype", None) is not None and v.dtype != object:
                out[k] = v
    return out


class EvalRuntime:
    """What evaluation hooks see: task + params + jitted encode."""

    def __init__(self, task: Any, params: Any, mesh: Any = None) -> None:
        self.task = task
        self.params = params
        self.mesh = mesh
        self._encode_jit: dict[str, Any] = {}
        self.all_dataset_info: dict = {}

    def encode(
        self, batch: Mapping[str, Any], modality: str, normalize: bool = False
    ) -> jnp.ndarray:
        """Jit-cached task.encode (one cache entry per modality/normalize).

        The cache lives on the *task* so repeated validation epochs reuse the
        compiled function (a fresh EvalRuntime is built per eval epoch).
        """
        cache = getattr(self.task, "_encode_jit_cache", None)
        if cache is None:
            cache = {}
            self.task._encode_jit_cache = cache
        self._encode_jit = cache
        key = f"{modality}:{normalize}"
        if key not in self._encode_jit:
            task = self.task

            def _enc(params, b):
                return task.encode(params, b, modality, normalize=normalize)

            self._encode_jit[key] = jax.jit(_enc)
        return self._encode_jit[key](self.params, device_batch(batch))


class EvaluationHooks:
    """Base class for evaluation tasks (reference: hooks.py:9-62)."""

    def on_evaluation_epoch_start(self, runtime: EvalRuntime) -> None:
        """Prepare metric state / precompute class embeddings."""

    def evaluation_step(
        self, runtime: EvalRuntime, batch: Mapping[str, Any], batch_idx: int
    ) -> Optional[Mapping[str, Any]]:
        """Accumulate metric state for one batch."""

    def on_evaluation_epoch_end(
        self, runtime: EvalRuntime
    ) -> Optional[dict[str, Any]]:
        """Compute + return metrics, reset state."""
        return None
