"""BERT-style (post-LN) text encoder.

Native counterpart of the reference's ``HFTextEncoder`` wrapper
(/root/reference/mmlearn/modules/encoders/text.py): a post-layer-norm
transformer with word+position+token-type embeddings and an optional tanh
pooler, whose parameter tree :func:`mmlearn_tpu.hf_utils.convert_bert`
produces from any HF ``BertModel``-family checkpoint. The reference rejects
decoder models (text.py:81-82) — this architecture is encoder-only by
construction.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmlearn_tpu.conf import store
from mmlearn_tpu.modules.encoders.base import EncoderOutput
from mmlearn_tpu.modules.layers.attention import Attention
from mmlearn_tpu.modules.layers.mlp import MLP


class BertBlock(nn.Module):
    """One post-LN BERT layer: x = LN(x + Attn(x)); x = LN(x + MLP(x))."""

    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    act_layer: str = "gelu"
    norm_eps: float = 1e-12
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic=True):
        attn_out = Attention(
            num_heads=self.num_heads,
            qkv_bias=True,
            attn_drop=self.attn_drop_rate,
            proj_drop=self.drop_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(x, attention_mask=attention_mask, deterministic=deterministic)
        x = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="attn_norm"
        )(x + attn_out)
        mlp_out = MLP(
            hidden_dims=[int(self.embed_dim * self.mlp_ratio)],
            out_dim=self.embed_dim,
            activation=self.act_layer,
            dropout=self.drop_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(x, deterministic=deterministic)
        return nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="mlp_norm"
        )(x + mlp_out)


@store(group="modules/encoders", name="BertTextEncoder")
class BertTextEncoder(nn.Module):
    """Post-LN BERT trunk over token ids."""

    vocab_size: int = 30522
    max_length: int = 512
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    act_layer: str = "gelu"
    norm_eps: float = 1e-12
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    pooling: str = "pooler"  # pooler | cls | mean | none
    use_pooler: bool = True
    proj_dim: Optional[int] = None
    scan_blocks: bool = False  # lax.scan over layers (~depth× faster compile)
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> EncoderOutput:
        b, n = input_ids.shape
        x = nn.Embed(
            self.vocab_size, self.embed_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="token_embedding",
        )(input_ids)
        positions = jnp.arange(n)[None, :]
        x = x + nn.Embed(
            self.max_length, self.embed_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="position_embedding",
        )(positions)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + nn.Embed(
            2, self.embed_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="token_type_embedding",
        )(token_type_ids)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="embed_norm")(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        block_kwargs = dict(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            act_layer=self.act_layer,
            norm_eps=self.norm_eps,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.scan_blocks:

            class _Body(nn.Module):
                @nn.compact
                def __call__(self, carry, _):
                    y = BertBlock(**block_kwargs, name="block")(
                        carry, attention_mask, deterministic
                    )
                    return y, None

            target = nn.remat(_Body) if self.remat else _Body
            scanned = nn.scan(
                target,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
            )
            x, _ = scanned(name="blocks")(x, None)
        else:
            for i in range(self.depth):
                x = BertBlock(**block_kwargs, name=f"blocks_{i}")(
                    x, attention_mask, deterministic
                )

        pooled = None
        if self.pooling == "pooler" and self.use_pooler:
            pooled = nn.tanh(
                nn.Dense(
                    self.embed_dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="pooler",
                )(x[:, 0])
            )
        elif self.pooling == "cls":
            pooled = x[:, 0]
        elif self.pooling == "mean":
            if attention_mask is not None:
                m = attention_mask[..., None].astype(x.dtype)
                pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1e-6)
            else:
                pooled = x.mean(axis=1)
        if pooled is not None and self.proj_dim is not None:
            pooled = nn.Dense(
                self.proj_dim, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="proj",
            )(pooled)
        return EncoderOutput(last_hidden_state=x, pooler_output=pooled)
