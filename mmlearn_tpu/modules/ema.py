"""Exponential moving average of a parameter tree.

Parity: /root/reference/mmlearn/modules/ema.py (``ExponentialMovingAverage``)
— per-step ``ema = d * ema + (1 - d) * param`` with linear decay annealing
from ``ema_decay`` to ``ema_end_decay`` over ``ema_anneal_end_step`` updates
(reference lines 132-177). In JAX the torch ``state_dict`` dance collapses to
a ``jax.tree.map``; the EMA tree lives inside the TrainState so it is
checkpointed/restored with everything else.

Note: the reference's ``_update_weights`` is a no-op copy in practice — it
branches on ``param.requires_grad`` over ``state_dict()`` tensors, which are
always detached (reference ema.py:147-148), so its teacher always equals the
student. This module implements the *documented* EMA; see PARITY.md
("Reference bugs not reproduced") and the trajectory parity test.

``skip_keys``: parameter subtrees matched by these path substrings copy the
student value instead of the moving average (reference ``skip_keys``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ExponentialMovingAverage:
    """EMA schedule + functional update over pytrees."""

    ema_decay: float = 0.9998
    ema_end_decay: float = 0.9999
    ema_anneal_end_step: int = 300000
    skip_keys: tuple[str, ...] = ()

    def get_annealed_rate(self, num_updates: jnp.ndarray) -> jnp.ndarray:
        """Linear decay annealing (reference: ema.py:166-177)."""
        if self.ema_decay == self.ema_end_decay:
            return jnp.asarray(self.ema_decay, jnp.float32)
        num_updates = jnp.asarray(num_updates, jnp.float32)
        frac = jnp.clip(num_updates / self.ema_anneal_end_step, 0.0, 1.0)
        return self.ema_decay + frac * (self.ema_end_decay - self.ema_decay)

    def init(self, params: Any) -> Any:
        """Deep-copy the student params as the initial teacher."""
        return jax.tree.map(jnp.array, params)

    def step(self, ema_params: Any, new_params: Any, num_updates: jnp.ndarray) -> Any:
        """One EMA update (jit-safe; called inside the train step)."""
        decay = self.get_annealed_rate(num_updates)

        def _update(path, ema, new):
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            if any(s in key for s in self.skip_keys):
                return new
            return decay * ema + (1.0 - decay) * new

        return jax.tree_util.tree_map_with_path(_update, ema_params, new_params)
