"""Data2Vec regression loss (parity: /root/reference/mmlearn/modules/losses/data2vec.py).

Scaled MSE or smooth-L1 (beta-thresholded) between predicted and target
embeddings, averaged over the feature dim then scaled by ``loss_scale``
(reference lines 45-88).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from mmlearn_tpu.conf import store


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    diff = pred - target
    abs_diff = jnp.abs(diff)
    return jnp.where(abs_diff < beta, 0.5 * diff**2 / beta, abs_diff - 0.5 * beta)


@store(group="modules/losses", name="Data2VecLoss", populate_full_signature=False)
@dataclass
class Data2VecLoss:
    """MSE (beta=0) or smooth-L1 (beta>0) over embeddings."""

    beta: float = 0.0
    loss_scale: Optional[float] = None
    reduction: str = "none"  # none (default, per-example sums) | mean | sum

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if x.shape != y.shape:
            raise ValueError(f"Shape mismatch: x: {x.shape}, y: {y.shape}")
        x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        y = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
        # elementwise mse / smooth-l1 (torch reduction="none" semantics)
        if self.beta == 0.0:
            loss = (x - y) ** 2
        else:
            loss = smooth_l1(x, y, self.beta)
        scale = (
            self.loss_scale
            if self.loss_scale is not None
            else 1.0 / (x.shape[-1] ** 0.5)
        )
        loss = loss * scale
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        # 'none': per-token sums over the feature dim — the reference sums
        # the already-flattened (N·P, D) rows (data2vec.py:68,87)
        return loss.sum(axis=-1)
