"""Normalization layers.

``L2Norm`` parity: /root/reference/mmlearn/modules/layers/normalization.py.
``FusedLayerNorm`` is the TPU-fused LayerNorm (optionally folding a residual
add) backing the transformer blocks — parameter-compatible with
``nn.LayerNorm`` (same ``scale``/``bias`` names) so checkpoints are
interchangeable; dispatches to :mod:`mmlearn_tpu.ops.fused_norm` Pallas
kernels on TPU and to identical XLA math elsewhere.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmlearn_tpu.conf import store
from mmlearn_tpu.ops.fused_norm import fused_add_layernorm, fused_layernorm


class FusedLayerNorm(nn.Module):
    """LayerNorm with f32 statistics; optionally fuses ``x + residual``.

    ``__call__(x)`` returns ``LN(x)``; ``__call__(x, residual)`` returns
    ``(r, LN(r))`` with ``r = x + residual`` computed in the same kernel
    (one HBM pass instead of three).
    """

    epsilon: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: Optional[jnp.ndarray] = None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        x = x.astype(self.dtype)
        if residual is None:
            return fused_layernorm(x, scale, bias, eps=self.epsilon)
        return fused_add_layernorm(x, residual.astype(self.dtype), scale,
                                   bias, eps=self.epsilon)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


@store(group="modules/layers", name="L2Norm", populate_full_signature=False)
class L2Norm(nn.Module):
    """L2-normalize along ``dim``."""

    dim: int = -1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return l2_normalize(x, axis=self.dim)
