"""Shared loaders for the med_benchmarking datasets.

The reference implements 14 per-dataset torch ``Dataset`` classes
(/root/reference/projects/med_benchmarking/datasets/); they reduce to three
loading strategies, implemented once here:

- :class:`HFImageClassification` — HuggingFace-hub-backed image classification
  (BACH, LC25000, NckCrc, PCAM, SICAP pattern: ``load_dataset`` + optional
  seeded train/test split, reference bach.py:42-53);
- :class:`CSVImageClassification` — CSV-metadata + image-dir datasets
  (HAM10000, PadUfes20 pattern);
- :class:`ImageTextManifest` — (image, caption) manifests in jsonl/csv
  (PMCOA pattern, pmcoa.py:147).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional

import numpy as np

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.builtin.image_utils import ImageTransform, load_image
from mmlearn_tpu.datasets.core.example import Example

# Shared zero-shot prompt templates for histopathology datasets
# (reference: pcam.py / bach.py / sicap.py zero_shot_prompt_templates)
HISTOPATHOLOGY_TEMPLATES = [
    "a histopathology slide showing {}.",
    "histopathology image of {}.",
    "pathology tissue showing {}.",
    "presence of {} tissue on image.",
]

DERMATOLOGY_TEMPLATES = [
    "a photo of a {}.",
    "a dermoscopic image of {}.",
    "an image of {} skin lesion.",
]


class _MedDatasetBase:
    id2label: dict[int, str] = {}
    zero_shot_prompt_templates: list[str] = HISTOPATHOLOGY_TEMPLATES

    def __init__(self, transform: Optional[Callable] = None, image_size: int = 224):
        self.transform = transform or ImageTransform(size=image_size)

    def _example(self, image: Any, label: Any, idx: int) -> Example:
        img = np.asarray(image)
        return Example(
            {
                "rgb": self.transform(img).astype(np.float32),
                "rgb_target": int(label),
                EXAMPLE_INDEX_KEY: idx,
            }
        )


class HFImageClassification(_MedDatasetBase):
    """HF-hub image classification.

    Two split protocols, matching the reference per dataset:

    - ``hub_splits`` lists split names passed straight to the hub (official
      splits — PCAM train/validation/test per reference pcam.py:50, NCK-CRC
      train/train_nonorm/validation per nck.py:40);
    - any other split name triggers the seeded 75/25 re-split of the hub
      'train' split (BACH protocol, reference bach.py:42-53).

    ``exclude_labels`` filters rows (NCK-CRC drops 'BACK', nck.py:70-72);
    ``label_mapping`` converts string hub labels to class ids (nck.py:47-57).
    """

    hub_name: str = ""
    image_key: str = "image"
    label_key: str = "label"
    split_seed: int = 0
    test_size: float = 0.25
    hub_splits: tuple = ()
    exclude_labels: tuple = ()
    label_mapping: Optional[dict[str, int]] = None

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        transform: Optional[Callable] = None,
        image_size: int = 224,
        hub_name: Optional[str] = None,
    ) -> None:
        super().__init__(transform, image_size)
        from datasets import load_dataset

        name = hub_name or self.hub_name
        cache_dir = os.path.join(root_dir, "scratch/")
        if split in self.hub_splits:
            dataset = load_dataset(name, cache_dir=cache_dir, split=split)
        else:
            dataset = load_dataset(name, cache_dir=cache_dir, split="train")
            if split in ("train", "test"):
                parts = dataset.train_test_split(
                    test_size=self.test_size,
                    train_size=1 - self.test_size,
                    shuffle=True,
                    seed=self.split_seed,
                )
                dataset = parts[split]
        if self.exclude_labels:
            excluded = set(self.exclude_labels)
            key = self.label_key
            dataset = dataset.filter(lambda row: row[key] not in excluded)
        self.data = dataset

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> Example:
        entry = self.data[idx]
        label = entry[self.label_key]
        if self.label_mapping is not None:
            label = self.label_mapping[str(label)]
        return self._example(entry[self.image_key], label, idx)


class CSVImageClassification(_MedDatasetBase):
    """CSV metadata + image files on disk."""

    csv_name: str = "metadata.csv"
    path_column: str = "image"
    label_column: str = "label"
    image_subdir: str = "images"
    label_names: Optional[dict[str, int]] = None  # str label → class id

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        transform: Optional[Callable] = None,
        image_size: int = 224,
    ) -> None:
        super().__init__(transform, image_size)
        import pandas as pd

        self.root_dir = root_dir
        df = pd.read_csv(os.path.join(root_dir, self.csv_name))
        if "split" in df.columns:
            df = df[df["split"] == split]
        self.paths = df[self.path_column].tolist()
        raw = df[self.label_column].tolist()
        if self.label_names:
            self.labels = [self.label_names[str(v)] for v in raw]
        else:
            self.labels = [int(v) for v in raw]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> Example:
        path = self.paths[idx]
        if not os.path.isabs(path):
            path = os.path.join(self.root_dir, self.image_subdir, path)
        return self._example(load_image(path), self.labels[idx], idx)


class ImageTextManifest:
    """(image, caption) pairs from a jsonl/csv manifest (PMCOA pattern)."""

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        file_type: str = "jsonl",
        image_key: str = "image",
        caption_key: str = "caption",
        csv_separator: str = ",",
        image_dir: str = "images",
        transform: Optional[Callable] = None,
        tokenizer: Optional[Callable] = None,
        image_size: int = 224,
    ) -> None:
        self.root_dir = root_dir
        self.image_dir = image_dir
        self.image_key = image_key
        self.caption_key = caption_key
        self.transform = transform or ImageTransform(size=image_size)
        self.tokenizer = tokenizer
        manifest = os.path.join(root_dir, f"{split}.{file_type}")
        self.entries: list[dict] = []
        if file_type == "jsonl":
            with open(manifest) as f:
                for line in f:
                    if line.strip():
                        self.entries.append(json.loads(line))
        else:
            import pandas as pd

            df = pd.read_csv(manifest, sep=csv_separator)
            self.entries = df.to_dict("records")

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Example:
        entry = self.entries[idx]
        path = entry[self.image_key]
        if not os.path.isabs(path):
            path = os.path.join(self.root_dir, self.image_dir, path)
        example = Example(
            {
                "rgb": self.transform(load_image(path)).astype(np.float32),
                EXAMPLE_INDEX_KEY: idx,
            }
        )
        caption = str(entry[self.caption_key])
        if self.tokenizer is not None:
            example.update(self.tokenizer(caption))
        else:
            example["text"] = caption
        return example
