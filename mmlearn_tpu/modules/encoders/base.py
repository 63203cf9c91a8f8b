"""Common encoder output container (HF ``BaseModelOutput``-like)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclass
class EncoderOutput:
    """Indexable output: ``out[0]`` is the last hidden state (reference
    encoders return HF ``BaseModelOutput`` and callers index ``[0]``,
    e.g. contrastive_pretraining.py:420). Registered as a JAX pytree so it
    can cross jit/eval_shape boundaries."""

    last_hidden_state: jnp.ndarray
    pooler_output: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None

    def __getitem__(self, idx: int) -> Any:
        return (self.last_hidden_state, self.pooler_output, self.hidden_states)[idx]


jax.tree_util.register_pytree_node(
    EncoderOutput,
    lambda o: ((o.last_hidden_state, o.pooler_output, o.hidden_states), None),
    lambda _, children: EncoderOutput(*children),
)
