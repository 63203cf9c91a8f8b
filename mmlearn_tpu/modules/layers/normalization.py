"""L2 normalization layer (parity: /root/reference/mmlearn/modules/layers/normalization.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mmlearn_tpu.conf import store


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


@store(group="modules/layers", name="L2Norm", populate_full_signature=False)
class L2Norm(nn.Module):
    """L2-normalize along ``dim``."""

    dim: int = -1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return l2_normalize(x, axis=self.dim)
