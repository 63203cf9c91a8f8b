"""Learnable logit scaling (ImageBind-style).

Parity: /root/reference/mmlearn/modules/layers/logit_scaling.py:10-54 —
a learnable ``exp(log_scale)`` multiplier clamped at ``max_logit_scale``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from mmlearn_tpu.conf import store


@store(
    group="modules/layers",
    name="LearnableLogitScaling",
    populate_full_signature=False,
)
class LearnableLogitScaling(nn.Module):
    """Multiply inputs by a (learnable) clamped exp(log_scale)."""

    logit_scale_init: float = 1 / 0.07
    learnable: bool = True
    max_logit_scale: float = 100.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = math.log(self.logit_scale_init)
        if self.learnable:
            log_scale = self.param(
                "log_logit_scale", lambda _: jnp.asarray(init, jnp.float32)
            )
        else:
            log_scale = jnp.asarray(init, jnp.float32)
        scale = jnp.clip(jnp.exp(log_scale), max=self.max_logit_scale)
        return scale * x
