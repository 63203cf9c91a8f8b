"""Pre-LN transformer block with stochastic depth.

Parity: /root/reference/mmlearn/modules/layers/transformer_block.py
(``Block`` + ``DropPath``). DropPath is implemented as a per-sample bernoulli
keep mask with rescaling — jit-friendly (no python branching on traced
values).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmlearn_tpu.modules.layers.attention import Attention
from mmlearn_tpu.modules.layers.mlp import MLP


def drop_path(
    x: jnp.ndarray,
    rate: float,
    rng: jax.Array,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Randomly drop the residual branch per sample (stochastic depth)."""
    if rate == 0.0 or deterministic:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, keep_prob, shape=shape)
    return jnp.where(keep, x / keep_prob, 0.0)


class DropPath(nn.Module):
    """Stochastic-depth module wrapper."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, rng, deterministic)


class BlockStack(nn.Module):
    """``depth`` × :class:`Block` via ``nn.scan`` (stacked params).

    Parameters get a leading ``depth`` axis (path ``blocks/block/...``);
    the XLA graph contains ONE block body instead of ``depth`` copies —
    compile time drops ~depth×, which matters on AOT-compile TPU runtimes.
    Restrictions: uniform ``drop_path_rate`` (stochastic-depth schedules need
    the unrolled loop) and no per-layer hidden-state taps.
    """

    depth: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    act_layer: str = "gelu"
    norm_eps: float = 1e-6
    causal: bool = False
    remat: bool = False
    remat_policy: Optional[str] = None  # None=save nothing | "dots_no_batch"
    scan_unroll: int = 1  # block bodies per scan iteration (XLA pipelines
    # across unrolled bodies; param layout is unchanged)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        stack = self

        class _Body(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                y = Block(
                    dim=stack.dim,
                    num_heads=stack.num_heads,
                    mlp_ratio=stack.mlp_ratio,
                    qkv_bias=stack.qkv_bias,
                    drop=stack.drop,
                    attn_drop=stack.attn_drop,
                    act_layer=stack.act_layer,
                    norm_eps=stack.norm_eps,
                    causal=stack.causal,
                    dtype=stack.dtype,
                    param_dtype=stack.param_dtype,
                    name="block",
                )(carry, attention_mask, deterministic)
                return y, None

        target = _Body
        if self.remat:
            from mmlearn_tpu.modules.layers.quantization import (
                exclude_int_dots,
                quant_mode,
            )

            policy = None
            if self.remat_policy == "dots_no_batch":
                # keep (cheap, bf16) projection/MLP outputs; recompute the
                # batched attention einsums whose f32 logits dominate HBM
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif self.remat_policy == "save_attn_out":
                # additionally keep the (bf16) attention outputs named in
                # Block — the block recompute then skips the attention
                # forward entirely (its bwd still rematerializes scores)
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names("attn_out"),
                )
            if policy is not None and quant_mode():
                # never save the s32 accumulators (6.9 GB/stack at ViT-B
                # b256 — measured OOM); the int8 chain recomputes in the
                # backward instead (saving the bf16 dequantized outputs via
                # save_only_these_names("int8_out") measured slower: 717 vs
                # 748 pairs/s — stash traffic beats recompute on v5e)
                policy = exclude_int_dots(policy)
            target = nn.remat(target, policy=policy)
        unroll = self.scan_unroll
        if self.depth % unroll:
            raise ValueError(
                f"scan_unroll={unroll} must divide depth={self.depth}"
            )
        scanned = nn.scan(
            target,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.depth,
            unroll=unroll,
        )
        y, _ = scanned(name="blocks")(x, None)
        return y


class Block(nn.Module):
    """Pre-LN transformer block: x + DropPath(Attn(LN(x))) + DropPath(MLP(LN(x)))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    act_layer: str = "gelu"
    norm_eps: float = 1e-6
    causal: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attention: bool = False,
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        from mmlearn_tpu.modules.layers.normalization import FusedLayerNorm

        y = FusedLayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="norm1"
        )(x)
        attn_out = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            causal=self.causal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(
            y,
            attention_mask=attention_mask,
            deterministic=deterministic,
            return_weights=return_attention,
        )
        if return_attention:
            attn_out, weights = attn_out
        # named for remat policies (BlockStack remat_policy="save_attn_out")
        from jax.ad_checkpoint import checkpoint_name
        attn_out = checkpoint_name(attn_out, "attn_out")
        branch = DropPath(self.drop_path_rate, name="drop_path1")(
            attn_out, deterministic
        )
        # residual add fused into the norm kernel: x, y = (x+branch, LN(...))
        x, y = FusedLayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="norm2"
        )(x, residual=branch)
        mlp_out = MLP(
            hidden_dims=[int(self.dim * self.mlp_ratio)],
            out_dim=self.dim,
            activation=self.act_layer,
            dropout=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path_rate, name="drop_path2")(
            mlp_out, deterministic
        )
        if return_attention:
            return x, weights
        return x
