"""NYUv2 RGB-D dataset.

Parity: /root/reference/mmlearn/datasets/nyuv2.py — RGB + depth (converted to
disparity, reference lines 38-65) with scene-class targets and ImageBind-style
label filtering (lines 136-147). Layout: ``<root>/<split>/rgb/*.png``,
``<root>/<split>/depth/*.png``, optional ``scene_class.json``.
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

# ImageBind's NYUv2 evaluation keeps these scene classes
# (reference: nyuv2.py:136-147)
IMAGEBIND_SCENES = (
    "bedroom", "kitchen", "living_room", "bathroom", "dining_room",
    "office", "home_office", "classroom", "bookstore", "others",
)


def depth_to_disparity(
    depth: np.ndarray, max_depth: float = 10.0, min_depth: float = 1e-3
) -> np.ndarray:
    """Depth map → normalized disparity (reference: nyuv2.py:38-65)."""
    depth = np.clip(depth.astype(np.float32), min_depth, max_depth)
    disparity = 1.0 / depth
    return disparity / float(1.0 / min_depth)


@store(group="datasets", name="NYUv2", populate_full_signature=False)
class NYUv2:
    """NYUv2 RGB+depth loader with disparity normalization."""

    def __init__(
        self,
        root_dir: Optional[str] = None,
        split: str = "train",
        return_type: str = "disparity",  # disparity | depth
        rgb_transform: Optional[Callable] = None,
        depth_transform: Optional[Callable] = None,
        image_size: int = 224,
        imagebind_scene_filter: bool = False,
    ) -> None:
        root_dir = root_dir or os.environ.get("NYUV2_ROOT_DIR")
        if root_dir is None:
            raise ValueError("NYUv2 requires root_dir (or $NYUV2_ROOT_DIR)")
        base = os.path.join(root_dir, split)
        self.rgb_paths = sorted(glob.glob(os.path.join(base, "rgb", "*")))
        if not self.rgb_paths:
            raise FileNotFoundError(f"No RGB images under {base}/rgb")
        self.return_type = return_type
        self.rgb_transform = rgb_transform or ImageTransform(size=image_size)
        self.depth_transform = depth_transform
        self.image_size = image_size

        scene_file = os.path.join(root_dir, "scene_class.json")
        self.scene_classes: dict[str, str] = {}
        if os.path.isfile(scene_file):
            with open(scene_file) as f:
                self.scene_classes = json.load(f)
        if imagebind_scene_filter and self.scene_classes:
            keep = set(IMAGEBIND_SCENES[:-1])
            self.scene_classes = {
                k: (v if v in keep else "others")
                for k, v in self.scene_classes.items()
            }
        scenes = sorted(set(self.scene_classes.values()))
        self.label_map = {s: i for i, s in enumerate(scenes)}

    def __len__(self) -> int:
        return len(self.rgb_paths)

    def _load_depth(self, path: str) -> np.ndarray:
        raw = load_image(path, mode="I")
        depth = raw.astype(np.float32) / 1000.0  # mm → m (common encoding)
        if self.return_type == "disparity":
            depth = depth_to_disparity(depth)
        from mmlearn_tpu.datasets.processors.transforms import center_crop, resize_image

        # aspect-preserving short-side resize + center crop, mirroring the
        # RGB ImageTransform eval path — a square resize would stretch the
        # short axis and spatially misalign depth with its RGB pair
        h, w = depth.shape[:2]
        scale = self.image_size / min(h, w)
        resized = resize_image(
            depth, (int(round(h * scale)), int(round(w * scale)))
        )
        cropped = center_crop(resized, self.image_size)
        return cropped.reshape(self.image_size, self.image_size, 1)

    def __getitem__(self, idx: int) -> Example:
        rgb_path = self.rgb_paths[idx]
        depth_path = rgb_path.replace(
            os.sep + "rgb" + os.sep, os.sep + "depth" + os.sep
        )
        example = Example(
            {
                "rgb": to_model_dtype(self.rgb_transform(load_image(rgb_path))),
                "depth": self._load_depth(depth_path).astype(np.float32),
                EXAMPLE_INDEX_KEY: idx,
            }
        )
        name = os.path.splitext(os.path.basename(rgb_path))[0]
        if name in self.scene_classes:
            example["depth_target"] = self.label_map[self.scene_classes[name]]
        return example
