"""From-scratch Flax text transformer (BERT-style and CLIP-style).

Capability parity with the reference's HF wrappers
(/root/reference/mmlearn/modules/encoders/text.py ``HFTextEncoder`` and
clip.py ``HFCLIPTextEncoder*``): instead of wrapping torch modules, this is a
native encoder whose parameter tree the HF checkpoints convert into
(mmlearn_tpu/hf_utils.py). Covers both families:

- BERT-style: bidirectional, learned pos-emb + token-type, CLS pooling;
- CLIP-style: causal, EOS-token pooling (position of the highest token id),
  quick-gelu, optional projection head.

Attention runs through the Pallas flash kernel with the batch padding mask.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.modules.encoders.base import EncoderOutput
from mmlearn_tpu.modules.layers.transformer_block import Block


@store(group="modules/encoders", name="TextTransformer")
class TextTransformer(nn.Module):
    """Transformer text encoder over token ids."""

    vocab_size: int = 49408
    max_length: int = 77
    embed_dim: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    causal: bool = True  # CLIP text towers are causal
    use_token_type: bool = False  # BERT-style segment embeddings
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    act_layer: str = "quick_gelu"
    norm_eps: float = 1e-5
    pooling: str = "eos"  # eos | cls | mean | none
    #: project EVERY token (reference CLIP use_all_token_embeddings);
    #: pooling is skipped and pooler_output is None
    proj_all_tokens: bool = False
    # On causal towers, padding sits after the EOS token and causal masking
    # already prevents it from influencing any earlier position — the
    # key-validity mask is a numerical no-op for every non-pad output.
    # Eliding it lets the fused MHA kernel run its unmasked path (~2x faster
    # kernel; see ops/fused_attention.py). Only hidden states AT padded
    # positions change, which downstream consumers must already ignore.
    elide_padding_mask: bool = False
    proj_dim: Optional[int] = None
    remat: bool = False
    remat_policy: str = "dots_no_batch"
    scan_blocks: bool = False  # lax.scan over blocks: ~depth× faster compile
    scan_unroll: int = 1  # block bodies per scan iteration (perf/compile knob)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_hidden_states: bool = False,
    ) -> EncoderOutput:
        b, n = input_ids.shape
        tok = nn.Embed(
            self.vocab_size,
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.01),
            (1, self.max_length, self.embed_dim),
            self.param_dtype,
        )
        x = tok + pos[:, :n].astype(tok.dtype)
        if self.use_token_type:
            token_type = jnp.zeros_like(input_ids)
            x = x + nn.Embed(
                2,
                self.embed_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="token_type_embedding",
            )(token_type)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        block_mask = attention_mask
        if self.elide_padding_mask and self.causal:
            block_mask = None

        hidden_states = []
        if self.scan_blocks and return_hidden_states:
            raise ValueError(
                "return_hidden_states is unavailable with scan_blocks=True "
                "(nn.scan has no per-layer taps) — build the encoder with "
                "scan_blocks=False to probe intermediate layers"
            )
        if self.scan_blocks:
            from mmlearn_tpu.modules.layers.transformer_block import BlockStack

            x = BlockStack(
                depth=self.depth,
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                act_layer=self.act_layer,
                norm_eps=self.norm_eps,
                causal=self.causal,
                remat=self.remat,
                remat_policy=self.remat_policy if self.remat else None,
                scan_unroll=self.scan_unroll,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="block_stack",
            )(x, block_mask, deterministic)
        else:
            for i in range(self.depth):
                x = Block(
                    dim=self.embed_dim,
                    num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    act_layer=self.act_layer,
                    norm_eps=self.norm_eps,
                    causal=self.causal,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"blocks_{i}",
                )(x, attention_mask=block_mask, deterministic=deterministic)
                if return_hidden_states:
                    hidden_states.append(x)

        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)

        if self.proj_all_tokens:
            if self.proj_dim is not None:
                x = nn.Dense(
                    self.proj_dim, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="proj",
                )(x)
            return EncoderOutput(
                last_hidden_state=x, pooler_output=None,
                hidden_states=tuple(hidden_states)
                if return_hidden_states else None,
            )

        pooled = None
        if self.pooling == "eos":
            # CLIP: features at the eot token == argmax of token ids
            eos_idx = jnp.argmax(input_ids, axis=-1)
            pooled = x[jnp.arange(b), eos_idx]
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
                self.proj_dim,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj",
            )(pooled)

        return EncoderOutput(
            last_hidden_state=x,
            pooler_output=pooled,
            hidden_states=tuple(hidden_states) if return_hidden_states else None,
        )


