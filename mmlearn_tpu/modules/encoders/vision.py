"""From-scratch Flax Vision Transformer family.

Capability parity with /root/reference/mmlearn/modules/encoders/vision.py:
the I-JEPA ``VisionTransformer`` (fixed 2-D sincos pos-emb, patch-keep masks
accepted in forward, reference lines 179-394), the narrower
``VisionTransformerPredictor`` (lines 397-569), and the size presets
vit_tiny..vit_giant (lines 680-908). The same class also covers the CLIP-style
vision tower (cls token, learned pos-emb, pre/post layernorm, quick-gelu) so
HF CLIP weights convert directly (see mmlearn_tpu/hf_utils.py).

TPU-first design notes:
- images are NHWC; all hot paths are batched matmuls on the MXU;
- I-JEPA patch masks are **static-size index arrays** ``(num_masks, B, K)``
  gathered with ``take_along_axis`` — no dynamic boolean shapes (the
  reference's dynamic boolean indexing, masking.py:241-287, doesn't compile
  on TPU);
- attention runs through the Pallas flash kernel.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.modules.encoders.base import EncoderOutput
from mmlearn_tpu.modules.layers.embedding import PatchEmbed, get_2d_sincos_pos_embed
from mmlearn_tpu.modules.layers.patch_dropout import PatchDropout
from mmlearn_tpu.modules.layers.transformer_block import Block


def apply_masks(x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Gather kept patch tokens under one or more index masks.

    Args:
        x: ``(B, N, D)`` patch tokens.
        masks: ``(num_masks, B, K)`` integer keep-indices (static K).

    Returns:
        ``(num_masks * B, K, D)`` gathered tokens, mask-major order —
        matching the reference's ``apply_masks`` concat semantics
        (/root/reference/mmlearn/datasets/processors/masking.py:241-287).
    """
    if masks.ndim == 2:
        masks = masks[None]
    num_masks, b, k = masks.shape
    gathered = jax.vmap(
        lambda m: jnp.take_along_axis(x, m[..., None], axis=1)
    )(masks)  # (num_masks, B, K, D)
    return gathered.reshape(num_masks * b, k, x.shape[-1])


def repeat_interleave_batch(x: jnp.ndarray, b: int, repeat: int) -> jnp.ndarray:
    """Repeat each consecutive ``b``-sized group ``repeat`` times.

    Reference: /root/reference/mmlearn/datasets/processors/transforms.py:55-79.
    """
    n = x.shape[0] // b
    out = jnp.tile(x.reshape(n, b, *x.shape[1:]), (1, repeat) + (1,) * (x.ndim - 1))
    return out.reshape(n * repeat * b, *x.shape[1:])


class VisionTransformer(nn.Module):
    """ViT trunk with optional CLS token, sincos/learned pos-emb, patch masks."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_cls_token: bool = False
    learned_pos_embed: bool = False
    pre_norm: bool = False  # CLIP's pre_layrnorm (clip.py:225)
    final_norm: bool = True
    act_layer: str = "gelu"
    norm_eps: float = 1e-6
    global_pool: str = "none"  # none | cls | avg
    #: project EVERY token with the head (reference CLIP
    #: use_all_token_embeddings: clip.py:334,464 projects last_hidden_state
    #: per token); pooler_output is then None — consumers pool downstream
    proj_all_tokens: bool = False
    proj_dim: Optional[int] = None
    #: bias on the proj head: False for CLIP-style projections (clip.py:241),
    #: True for a timm classifier-head projection (TimmViT passes
    #: num_classes=projection_dim to timm, whose head is a biased Linear —
    #: reference vision.py:33-176)
    proj_bias: bool = False
    patch_drop_rate: float = 0.0
    patch_embed_bias: bool = True
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM
    remat_policy: str = "dots_no_batch"
    scan_blocks: bool = False  # lax.scan over blocks: ~depth× faster compile
    scan_unroll: int = 1  # block bodies per scan iteration (perf/compile knob)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        g = self.img_size // self.patch_size
        return g * g

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        patch_masks: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_hidden_states: bool = False,
    ) -> EncoderOutput:
        grid = self.img_size // self.patch_size
        num_prefix = 1 if self.use_cls_token else 0

        if x.ndim == 4:  # (B, H, W, C) image
            x = PatchEmbed(
                img_size=self.img_size,
                patch_size=self.patch_size,
                embed_dim=self.embed_dim,
                use_bias=self.patch_embed_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="patch_embed",
            )(x)
        b, n, _ = x.shape

        if self.learned_pos_embed:
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, self.num_patches + num_prefix, self.embed_dim),
                self.param_dtype,
            )
        else:
            table = get_2d_sincos_pos_embed(
                self.embed_dim, grid, cls_token=self.use_cls_token
            )
            pos_embed = jnp.asarray(table[None], self.dtype)

        # add *patch* pos-emb before masking so kept indices keep their
        # positional identity (reference: vision.py:323-337)
        x = x + pos_embed[:, num_prefix:].astype(x.dtype)

        if patch_masks is not None:
            x = apply_masks(x, patch_masks)
            b = x.shape[0]

        if self.use_cls_token:
            cls = self.param(
                "cls_token",
                nn.initializers.normal(0.02),
                (1, 1, self.embed_dim),
                self.param_dtype,
            )
            cls = cls + pos_embed[:, :1].astype(cls.dtype)
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, x.shape[-1])), x], 1)

        if self.patch_drop_rate > 0.0:
            x = PatchDropout(
                keep_rate=1.0 - self.patch_drop_rate,
                num_prefix_tokens=num_prefix,
                name="patch_drop",
            )(x, deterministic=deterministic)

        if self.pre_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm_pre")(x)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        hidden_states = []
        if self.scan_blocks and return_hidden_states:
            # the two modes have different param layouts (stacked
            # block_stack/blocks/block vs per-layer blocks_{i}); silently
            # switching would request params that don't exist
            raise ValueError(
                "return_hidden_states is unavailable with scan_blocks=True "
                "(nn.scan has no per-layer taps) — build the encoder with "
                "scan_blocks=False to probe intermediate layers"
            )
        if self.scan_blocks:
            if self.drop_path_rate > 0:
                raise ValueError(
                    "scan_blocks requires drop_path_rate == 0 (per-layer "
                    "stochastic-depth schedules need the unrolled loop)"
                )
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
                remat=self.remat,
                remat_policy=self.remat_policy if self.remat else None,
                scan_unroll=self.scan_unroll,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="block_stack",
            )(x, None, deterministic)
            return self._head(x, num_prefix, None)

        # static_argnums: (self, x, attention_mask, deterministic) → 3
        block_cls = (
            nn.remat(Block, static_argnums=(3,)) if self.remat else Block
        )
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=float(dpr[i]),
                act_layer=self.act_layer,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(x, None, deterministic)
            if return_hidden_states:
                hidden_states.append(x)

        return self._head(
            x, num_prefix, tuple(hidden_states) if return_hidden_states else None
        )

    def _head(
        self, x: jnp.ndarray, num_prefix: int, hidden_states: Optional[tuple]
    ) -> EncoderOutput:
        if self.final_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)

        if self.proj_all_tokens:
            if self.proj_dim is not None:
                x = nn.Dense(
                    self.proj_dim, use_bias=self.proj_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="proj",
                )(x)
            return EncoderOutput(
                last_hidden_state=x, pooler_output=None,
                hidden_states=hidden_states,
            )

        pooled = None
        if self.global_pool == "cls" and not self.use_cls_token:
            raise ValueError(
                "global_pool='cls' requires use_cls_token=True"
            )
        if self.global_pool == "cls":
            pooled = x[:, 0]
        elif self.global_pool == "avg":
            pooled = x[:, num_prefix:].mean(axis=1)
        if pooled is not None and self.proj_dim is not None:
            pooled = nn.Dense(
                self.proj_dim,
                use_bias=self.proj_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj",
            )(pooled)

        return EncoderOutput(
            last_hidden_state=x,
            pooler_output=pooled,
            hidden_states=hidden_states,
        )


class VisionTransformerPredictor(nn.Module):
    """I-JEPA predictor: predicts target-patch reps from context tokens.

    Reference: /root/reference/mmlearn/modules/encoders/vision.py:397-569.
    ``__call__(z, enc_masks, pred_masks)``: embed context tokens to the
    (narrower) predictor width, add pos-emb at their true positions, append
    pos-embedded mask tokens at target positions, run the trunk, return
    predictions for the target tokens only, projected back to encoder width.
    """

    num_patches: int = 196
    embed_dim: int = 768
    predictor_embed_dim: int = 384
    depth: int = 6
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        enc_masks: jnp.ndarray,
        pred_masks: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if enc_masks.ndim == 2:
            enc_masks = enc_masks[None]
        if pred_masks.ndim == 2:
            pred_masks = pred_masks[None]
        n_enc, b, k_ctx = enc_masks.shape
        n_pred, _, k_tgt = pred_masks.shape

        x = nn.Dense(
            self.predictor_embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="predictor_embed",
        )(z)  # (n_enc*B, K_ctx, Dp)

        grid = int(self.num_patches**0.5)
        table = jnp.asarray(
            get_2d_sincos_pos_embed(self.predictor_embed_dim, grid)[None], self.dtype
        )  # (1, N, Dp)

        ctx_pos = apply_masks(
            jnp.broadcast_to(table, (b, self.num_patches, self.predictor_embed_dim)),
            enc_masks,
        )  # (n_enc*B, K_ctx, Dp)
        x = x + ctx_pos

        tgt_pos = apply_masks(
            jnp.broadcast_to(table, (b, self.num_patches, self.predictor_embed_dim)),
            pred_masks,
        )  # (n_pred*B, K_tgt, Dp)
        tgt_pos = repeat_interleave_batch(tgt_pos, b, repeat=n_enc)

        mask_token = self.param(
            "mask_token",
            nn.initializers.normal(0.02),
            (1, 1, self.predictor_embed_dim),
            self.param_dtype,
        )
        pred_tokens = mask_token.astype(self.dtype) + tgt_pos

        # tile context for each prediction mask: (n_pred * n_enc*B, K_ctx, Dp)
        x = jnp.tile(x, (n_pred, 1, 1))
        x = jnp.concatenate([x, pred_tokens], axis=1)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(
                dim=self.predictor_embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=float(dpr[i]),
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        x = x[:, k_ctx:]  # keep predicted target tokens
        return nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="predictor_proj",
        )(x)


# -- size presets (reference: vision.py:680-908, dims table :901-908) --------

_VIT_DIMS = {
    "tiny": dict(embed_dim=192, depth=12, num_heads=3),
    "small": dict(embed_dim=384, depth=12, num_heads=6),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "huge": dict(embed_dim=1280, depth=32, num_heads=16),
    "giant": dict(embed_dim=1408, depth=40, num_heads=16, mlp_ratio=48 / 11),
}


def _vit(size: str, **kwargs: Any) -> VisionTransformer:
    cfg: dict[str, Any] = dict(_VIT_DIMS[size])
    cfg.update(kwargs)
    return VisionTransformer(**cfg)


vit_tiny = functools.partial(_vit, "tiny")
vit_small = functools.partial(_vit, "small")
vit_base = functools.partial(_vit, "base")
vit_large = functools.partial(_vit, "large")
vit_huge = functools.partial(_vit, "huge")
vit_giant = functools.partial(_vit, "giant")

for _size in _VIT_DIMS:
    store.store_node(
        "modules/encoders",
        f"vit_{_size}",
        {
            "_target_": "mmlearn_tpu.modules.encoders.vision._vit",
            "_args_": [_size],
            "img_size": 224,
            "patch_size": 16,
        },
    )


def vit_predictor(**kwargs: Any) -> VisionTransformerPredictor:
    return VisionTransformerPredictor(**kwargs)


store(group="modules/encoders", name="vit_predictor", populate_full_signature=False)(
    vit_predictor
)
store(group="modules/encoders", name="VisionTransformer")(VisionTransformer)
