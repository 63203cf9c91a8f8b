"""Host-side image loading + transform pipeline for dataset wrappers.

Replaces torchvision transforms in the reference's dataset configs with
PIL/numpy equivalents producing fixed-shape float32 HWC arrays (NHWC is the
TPU-native layout).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from mmlearn_tpu.conf import store

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def load_image(path: str, mode: str = "RGB") -> np.ndarray:
    """Load an image file as HWC uint8 (or HW for depth/grayscale modes)."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert(mode) if mode else img
        return np.asarray(img)


def decode_transform_jpeg(
    data: bytes, transform: "ImageTransform",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Decode JPEG bytes and apply a transform.

    Both paths ride the native C++ fastloader when available
    (mmlearn_tpu/native/fastloader.cpp): eval = fused decode+resize+center
    crop, train = fused decode+random-resized-crop+hflip with a seed drawn
    from ``rng``. PIL is the fallback.
    """
    from mmlearn_tpu import native

    if native.available():
        try:
            if transform.train:
                seed_rng = rng or np.random.default_rng()
                arr = native.decode_jpeg_train(
                    data,
                    transform.size,
                    scale=tuple(transform.random_crop_scale),
                    hflip_prob=transform.hflip_prob,
                    seed=int(seed_rng.integers(0, 2**63 - 1)),
                )
            else:
                arr = native.decode_jpeg(data, transform.size)
            if transform.device_normalize:
                return arr  # uint8; trainer normalizes on device
            out = arr.astype(np.float32) / 255.0
            return (out - np.asarray(transform.mean, np.float32)) / np.asarray(
                transform.std, np.float32
            )
        except (ValueError, RuntimeError):
            pass
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        return transform(np.asarray(img.convert("RGB")), rng=rng)


def to_model_dtype(img: np.ndarray) -> np.ndarray:
    """float32 for host-normalized images; uint8 passes through untouched.

    ``ImageTransform(device_normalize=True)`` deliberately emits uint8 so the
    trainer's on-device ``(x/255 - mean)/std`` runs (4x smaller host->device
    transfer); an unconditional ``astype(np.float32)`` here would skip that
    branch (it matches dtype==uint8 only) AND the host normalization —
    feeding raw 0-255 floats to the model."""
    if img.dtype == np.uint8:
        return img
    return img.astype(np.float32)


@store(group="datasets/transforms", name="ImageTransform", populate_full_signature=False)
@dataclass
class ImageTransform:
    """Resize(+crop) → scale to [0,1] → normalize; train adds random crop/flip.

    Matches the reference's eval pipeline shape (resize shorter side →
    center crop → normalize; e.g. med_clip_vision_transform,
    /root/reference/projects/med_benchmarking/datasets/__init__.py:60-105).
    """

    size: int = 224
    mean: Sequence[float] = CLIP_MEAN
    std: Sequence[float] = CLIP_STD
    train: bool = False
    random_crop_scale: tuple[float, float] = (0.6, 1.0)
    hflip_prob: float = 0.5
    #: emit uint8 pixels and defer (x/255 - mean)/std to the device (the
    #: trainer's device_normalize config; 4x smaller host→device transfer)
    device_normalize: bool = False

    def __call__(
        self, img: np.ndarray, rng: Optional[np.random.Generator] = None
    ) -> np.ndarray:
        from PIL import Image

        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        pil = Image.fromarray(img.astype(np.uint8))
        if self.train:
            rng = rng or np.random.default_rng()
            w, h = pil.size
            scale = rng.uniform(*self.random_crop_scale)
            cw, ch = int(w * np.sqrt(scale)), int(h * np.sqrt(scale))
            left = rng.integers(0, max(1, w - cw + 1))
            top = rng.integers(0, max(1, h - ch + 1))
            pil = pil.crop((left, top, left + cw, top + ch)).resize(
                (self.size, self.size), Image.BICUBIC
            )
            if rng.random() < self.hflip_prob:
                pil = pil.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            w, h = pil.size
            short = min(w, h)
            nw, nh = int(round(w * self.size / short)), int(round(h * self.size / short))
            pil = pil.resize((nw, nh), Image.BICUBIC)
            left = (nw - self.size) // 2
            top = (nh - self.size) // 2
            pil = pil.crop((left, top, left + self.size, top + self.size))
        if self.device_normalize:
            return np.asarray(pil, np.uint8)
        out = np.asarray(pil, np.float32) / 255.0
        return (out - np.asarray(self.mean, np.float32)) / np.asarray(
            self.std, np.float32
        )
