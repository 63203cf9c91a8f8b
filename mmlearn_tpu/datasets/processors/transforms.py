"""Text/image transform utilities.

Parity: /root/reference/mmlearn/datasets/processors/transforms.py (``TrimText``
char-level trim, ``repeat_interleave_batch`` — the latter lives with the model
code at mmlearn_tpu/modules/encoders/vision.py since it is a jnp op here).
Plus host-side numpy image transforms used by dataset wrappers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from mmlearn_tpu.conf import store


@store(group="datasets/transforms", name="TrimText", populate_full_signature=False)
@dataclass
class TrimText:
    """Trim text to ``trim_size`` characters (reference: transforms.py:10-52)."""

    trim_size: int = 512

    def __call__(self, sentence: str | Sequence[str]) -> str | list[str]:
        if isinstance(sentence, str):
            return sentence[: self.trim_size]
        return [s[: self.trim_size] for s in sentence]


def normalize_image(
    img: np.ndarray,
    mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
    std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
) -> np.ndarray:
    """Normalize a float HWC image with (CLIP-default) channel stats."""
    img = np.asarray(img, np.float32)
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def resize_image(img: np.ndarray, size) -> np.ndarray:
    """Bilinear-resize an HWC uint8/float image (numpy-only).

    ``size``: int → square ``(size, size)``; ``(h, w)`` tuple → exact target
    shape (use for aspect-preserving resizes)."""
    th, tw = (size, size) if isinstance(size, int) else size
    h, w = img.shape[:2]
    if (h, w) == (th, tw):
        # same contract as the resize branch: float32, channel dim present
        out = np.asarray(img, np.float32)
        return out[..., None] if out.ndim == 2 else out
    ys = np.linspace(0, h - 1, th)
    xs = np.linspace(0, w - 1, tw)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    # float32 weights: float64 linspace would upcast the whole output
    # (2x host memory + transfer for every decoded image)
    wy = (ys - y0)[:, None, None].astype(np.float32)
    wx = (xs - x0)[None, :, None].astype(np.float32)
    img = img.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return img[top : top + size, left : left + size]


def pad_or_trim(x: np.ndarray, length: int, axis: int = -1) -> np.ndarray:
    """Pad with zeros or trim to a fixed length along ``axis``.

    Reference: librispeech.py:20-55 (30 s @ 16 kHz audio normalization).
    """
    x = np.asarray(x)
    cur = x.shape[axis]
    if cur == length:
        return x
    if cur > length:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, length)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, length - cur)
    return np.pad(x, pad)
