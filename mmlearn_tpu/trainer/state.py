"""Train state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    """Everything that evolves during training (checkpointed as one tree).

    ``extras`` holds task-owned auxiliary state (EMA teachers, ...) — the JAX
    equivalent of the reference's task-level checkpoint hooks injecting EMA
    state (/root/reference/mmlearn/tasks/ijepa.py:188-215).
    """

    step: jnp.ndarray
    params: Any
    opt_state: Any
    extras: Any
