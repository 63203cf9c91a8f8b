"""SUN RGB-D dataset.

Parity: /root/reference/mmlearn/datasets/sunrgbd.py — RGB + depth with
depth→disparity conversion via the sensor focal length (reference line 66)
and scene-class targets. Layout: ``<root>/<split>/rgb``, ``depth``,
``intrinsics.json`` (per-image focal length), ``scene_class.json``.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, Optional

import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.builtin.image_utils import (
    ImageTransform,
    load_image,
    to_model_dtype,
)
from mmlearn_tpu.datasets.core.example import Example

BASELINE_M = 0.075  # stereo baseline used for disparity conversion


@store(group="datasets", name="SUNRGBD", populate_full_signature=False)
class SUNRGBD:
    """SUN RGB-D loader with focal-length disparity conversion."""

    def __init__(
        self,
        root_dir: Optional[str] = None,
        split: str = "train",
        return_type: str = "disparity",
        rgb_transform: Optional[Callable] = None,
        image_size: int = 224,
    ) -> None:
        root_dir = root_dir or os.environ.get("SUNRGBD_ROOT_DIR")
        if root_dir is None:
            raise ValueError("SUNRGBD requires root_dir (or $SUNRGBD_ROOT_DIR)")
        base = os.path.join(root_dir, split)
        self.rgb_paths = sorted(glob.glob(os.path.join(base, "rgb", "*")))
        if not self.rgb_paths:
            raise FileNotFoundError(f"No RGB images under {base}/rgb")
        self.return_type = return_type
        self.rgb_transform = rgb_transform or ImageTransform(size=image_size)
        self.image_size = image_size

        self.focal: dict[str, float] = {}
        intr = os.path.join(root_dir, "intrinsics.json")
        if os.path.isfile(intr):
            with open(intr) as f:
                self.focal = json.load(f)
        self.scene_classes: dict[str, str] = {}
        scene_file = os.path.join(root_dir, "scene_class.json")
        if os.path.isfile(scene_file):
            with open(scene_file) as f:
                self.scene_classes = json.load(f)
        scenes = sorted(set(self.scene_classes.values()))
        self.label_map = {s: i for i, s in enumerate(scenes)}

    def __len__(self) -> int:
        return len(self.rgb_paths)

    def _load_depth(self, path: str, name: str) -> np.ndarray:
        raw = load_image(path, mode="I").astype(np.float32)
        depth_m = raw / 10000.0  # SUN RGB-D 16-bit depth encoding
        if self.return_type == "disparity":
            # disparity = focal * baseline / depth (reference: sunrgbd.py:66)
            focal = float(self.focal.get(name, 518.8579))
            with np.errstate(divide="ignore"):
                out = focal * BASELINE_M / np.maximum(depth_m, 1e-3)
        else:
            out = depth_m
        from mmlearn_tpu.datasets.processors.transforms import center_crop, resize_image

        # aspect-preserving short-side resize + center crop (matches the RGB
        # ImageTransform eval path; see nyuv2.py for the misalignment note)
        h, w = out.shape[:2]
        scale = self.image_size / min(h, w)
        resized = resize_image(
            out, (int(round(h * scale)), int(round(w * scale)))
        )
        cropped = center_crop(resized, self.image_size)
        return cropped.reshape(self.image_size, self.image_size, 1)

    def __getitem__(self, idx: int) -> Example:
        rgb_path = self.rgb_paths[idx]
        depth_path = rgb_path.replace(
            os.sep + "rgb" + os.sep, os.sep + "depth" + os.sep
        )
        name = os.path.splitext(os.path.basename(rgb_path))[0]
        example = Example(
            {
                "rgb": to_model_dtype(self.rgb_transform(load_image(rgb_path))),
                "depth": self._load_depth(depth_path, name).astype(np.float32),
                EXAMPLE_INDEX_KEY: idx,
            }
        )
        if name in self.scene_classes:
            example["depth_target"] = self.label_map[self.scene_classes[name]]
        return example
