"""Multi-head self-attention module.

Capability parity with /root/reference/mmlearn/modules/layers/attention.py
(vanilla MHSA), but the score computation runs through the Pallas
flash-attention kernel (:func:`mmlearn_tpu.ops.flash_attention.flash_attention`)
instead of materializing softmax(QK^T) in HBM. The fused qkv projection is
named ``qkv`` and the output projection ``proj`` so the tensor-parallel
partitioning rules match.

Unlike the reference (which returns ``(out, attn_weights)``), attention
weights are not materialized by default — ``return_weights=True`` switches to
the XLA path and returns them for introspection/tests.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmlearn_tpu.ops.flash_attention import flash_attention
from mmlearn_tpu.ops.fused_attention import fused_mha, supports_fused


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection.

    The fused ``qkv`` kernel is packed **head-major**
    (``[h0_q | h0_k | h0_v | h1_q | ...]``, see
    :mod:`mmlearn_tpu.ops.fused_attention`) so the short-seq Pallas kernel
    consumes the projection output with zero layout ops. Weight converters
    produce this packing via ``interleave_qkv_heads``.
    """

    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    causal: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_weights: bool = False,
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = x.shape
        if c % self.num_heads != 0:
            raise ValueError(f"dim {c} not divisible by num_heads {self.num_heads}")
        head_dim = c // self.num_heads
        scale = self.qk_scale if self.qk_scale is not None else head_dim**-0.5

        from mmlearn_tpu.modules.layers.quantization import dense

        qkv = dense(
            features=3 * c,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="qkv",
        )(x)  # (b, n, H*3*D) head-major

        # drop statically-all-true masks so the kernel elides masking work
        if attention_mask is not None and attention_mask.ndim != 2:
            raise ValueError(
                f"attention_mask must be (batch, kv_seq), got "
                f"{attention_mask.shape}"
            )

        use_dropout = self.attn_drop > 0.0 and not deterministic

        # sequence-parallel path: a >1 'seq' mesh axis shards the tokens —
        # ring attention rotates k/v over the axis (ops/ring_attention)
        ring_mesh = None
        if not (return_weights or use_dropout) and attention_mask is None:
            from mmlearn_tpu.parallel.mesh import peek_global_mesh

            m = peek_global_mesh()
            if (
                m is not None
                and "seq" in m.axis_names
                and m.shape["seq"] > 1
                and n % m.shape["seq"] == 0
            ):
                ring_mesh = m

        if ring_mesh is not None:
            from mmlearn_tpu.ops.ring_attention import (
                sequence_sharded_attention,
            )

            hm = qkv.reshape(b, n, self.num_heads, 3, head_dim)
            q = jnp.transpose(hm[..., 0, :], (0, 2, 1, 3))  # (b, h, n, d)
            k = jnp.transpose(hm[..., 1, :], (0, 2, 1, 3))
            v = jnp.transpose(hm[..., 2, :], (0, 2, 1, 3))
            out = sequence_sharded_attention(
                q, k, v, ring_mesh, scale=scale, causal=self.causal
            )
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
            attn = None
        elif return_weights or use_dropout:
            # XLA path: materializes weights (introspection or attn dropout).
            hm = qkv.reshape(b, n, self.num_heads, 3, head_dim)
            q = jnp.transpose(hm[..., 0, :], (0, 2, 1, 3))  # (b, h, n, d)
            k = jnp.transpose(hm[..., 1, :], (0, 2, 1, 3))
            v = jnp.transpose(hm[..., 2, :], (0, 2, 1, 3))
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if attention_mask is not None:
                neg = jnp.finfo(jnp.float32).min * 0.7
                s = jnp.where(attention_mask[:, None, None, :].astype(bool), s, neg)
            if self.causal:
                causal_mask = jnp.tril(jnp.ones((n, n), dtype=bool))
                s = jnp.where(causal_mask, s, jnp.finfo(jnp.float32).min * 0.7)
            attn = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            if use_dropout:
                attn = nn.Dropout(self.attn_drop, deterministic=False)(attn)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        elif supports_fused(self.num_heads, head_dim, n):
            # short-seq fused kernel (TPU) / identical XLA math elsewhere
            out = fused_mha(
                qkv, attention_mask, num_heads=self.num_heads, scale=scale,
                causal=self.causal,
            )
            attn = None
        else:
            hm = qkv.reshape(b, n, self.num_heads, 3, head_dim)
            q = jnp.transpose(hm[..., 0, :], (0, 2, 1, 3))
            k = jnp.transpose(hm[..., 1, :], (0, 2, 1, 3))
            v = jnp.transpose(hm[..., 2, :], (0, 2, 1, 3))
            out = flash_attention(
                q, k, v, mask=attention_mask, scale=scale, causal=self.causal
            )
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
            attn = None

        out = dense(
            features=c,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(out)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        if return_weights:
            return out, attn
        return out
