"""Patch embedding and sin-cos position embeddings.

Parity: /root/reference/mmlearn/modules/layers/embedding.py (``PatchEmbed``
conv patchify, ``ConvEmbed`` 3x3 stem, 1-D/2-D sincos generators). The sincos
generators are pure jnp (computed once at init, stored as constants), images
are NHWC (TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """Sin-cos embedding of scalar positions. Reference: embedding.py:183-222."""
    if embed_dim % 2 != 0:
        raise ValueError("embed_dim must be even")
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def get_1d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    pos = np.arange(grid_size, dtype=np.float32)
    emb = get_1d_sincos_pos_embed_from_grid(embed_dim, pos)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim), np.float32), emb], axis=0)
    return emb


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int | tuple[int, int], cls_token: bool = False
) -> np.ndarray:
    """2-D sin-cos position embedding. Reference: embedding.py:108-180."""
    if isinstance(grid_size, int):
        grid_h = grid_w = grid_size
    else:
        grid_h, grid_w = grid_size
    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    grid = np.meshgrid(gw, gh)  # w goes first (reference convention)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_h, grid_w)
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim), np.float32), emb], axis=0)
    return emb


class PatchEmbed(nn.Module):
    """Image-to-patch embedding via strided conv (reference: embedding.py:9-45).

    Input is NHWC ``(B, H, W, C)``; output ``(B, num_patches, embed_dim)``.
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def grid_size(self) -> tuple[int, int]:
        return (self.img_size // self.patch_size, self.img_size // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError(f"Expected (B, H, W, C) input, got {x.shape}")
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x)
        b, gh, gw, c = x.shape
        return x.reshape(b, gh * gw, c)


class ConvEmbed(nn.Module):
    """Stack-of-3x3-convs patch stem (reference: embedding.py:48-105)."""

    channels: tuple[int, ...] = (64, 128, 256)
    embed_dim: int = 768
    strides: tuple[int, ...] = (2, 2, 2)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, (ch, s) in enumerate(zip(self.channels, self.strides)):
            x = nn.Conv(
                ch,
                kernel_size=(3, 3),
                strides=(s, s),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x)
        b, gh, gw, c = x.shape
        return x.reshape(b, gh * gw, c)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, new_grid: tuple[int, int], old_grid: tuple[int, int],
    num_prefix_tokens: int = 1,
) -> jnp.ndarray:
    """Bicubic-style (bilinear on TPU) pos-emb resize for new image sizes.

    Reference: vision.py:362-394 (bicubic interpolation of ViT pos embeds).
    """
    import jax

    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    dim = grid.shape[-1]
    grid = grid.reshape(1, old_grid[0], old_grid[1], dim)
    grid = jax.image.resize(
        grid, (1, new_grid[0], new_grid[1], dim), method="bicubic"
    )
    grid = grid.reshape(1, new_grid[0] * new_grid[1], dim)
    return jnp.concatenate([prefix, grid], axis=1)
