"""Patch (token) dropout keeping the CLS token.

Parity: /root/reference/mmlearn/modules/layers/patch_dropout.py:46-99
(sorted-noise selection). TPU note: the keep count is static
(``int(num_patches * (1 - rate))``) so shapes stay fixed under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmlearn_tpu.conf import store


@store(group="modules/layers", name="PatchDropout", populate_full_signature=False)
class PatchDropout(nn.Module):
    """Randomly drop patch tokens (keeps a prefix CLS token if present)."""

    keep_rate: float = 0.5
    num_prefix_tokens: int = 1
    bias: float = 0.0  # accepted for reference API parity; unused

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.keep_rate >= 1.0:
            return x
        b, n, d = x.shape
        prefix = x[:, : self.num_prefix_tokens]
        patches = x[:, self.num_prefix_tokens :]
        num_patches = n - self.num_prefix_tokens
        num_keep = max(1, int(num_patches * self.keep_rate))
        rng = self.make_rng("dropout")
        noise = jax.random.uniform(rng, (b, num_patches))
        # keep the num_keep smallest-noise patches, preserving original order
        keep_idx = jnp.sort(jnp.argsort(noise, axis=1)[:, :num_keep], axis=1)
        kept = jnp.take_along_axis(patches, keep_idx[..., None], axis=1)
        return jnp.concatenate([prefix, kept], axis=1)
