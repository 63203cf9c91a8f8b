"""BIOSCAN insect dataset (trimodal: image + DNA barcode + taxonomy text).

Parity: /root/reference/projects/bioscan_clip/dataset.py — registers the
``dna`` modality at import, loads the BIOSCAN-1M/5M HDF5 file with its 13
named splits, decodes per-example JPEG bytes (``image`` + ``image_mask``
length), tokenizes barcodes with the k-mer :class:`DNAProcessor`, and carries
precomputed language tokens + taxonomy label dicts for the taxonomic eval.
"""

from __future__ import annotations

from typing import Literal, Optional, Union

import numpy as np

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.builtin.image_utils import CLIP_MEAN, CLIP_STD, ImageTransform
from mmlearn_tpu.datasets.core import Example, Modalities

from projects.bioscan_clip.dna_tokenizer import DNAProcessor

# NOTE: must run before any use of Modalities.DNA (reference: dataset.py:18)
if not Modalities.has_modality("dna"):
    Modalities.register_modality("dna")

SPLITS = (
    "all_keys",
    "no_split",
    "no_split_and_seen_train",
    "seen_keys",
    "single_species",
    "test_seen",
    "test_unseen",
    "test_unseen_keys",
    "train_seen",
    "val_seen",
    "val_unseen",
    "val_unseen_keys",
    "unseen_keys",
)

LEVELS = ("order", "family", "genus", "species")


class BIOSCANInsectDataset:
    """HDF5-backed trimodal insect dataset."""

    def __init__(
        self,
        path_to_hdf5_file: str,
        variant: Literal["1m", "5m"] = "1m",
        split: str = "train_seen",
        image_input_type: Literal["image", "feature"] = "image",
        dna_input_type: Literal["sequence", "feature"] = "sequence",
        dna_processor: Optional[DNAProcessor] = None,
        labels: Optional[Union[int, list]] = None,
        for_training: bool = True,
        image_size: int = 224,
    ) -> None:
        import h5py

        if split not in SPLITS:
            raise ValueError(f"Unknown split '{split}'; expected one of {SPLITS}")
        self.variant = variant
        self.split = split
        self.image_input_type = image_input_type
        self.dna_input_type = dna_input_type
        self.for_training = for_training
        self.dna_processor = dna_processor or DNAProcessor(max_length=660)
        self.data = h5py.File(path_to_hdf5_file, "r", libver="latest")[split]
        self.transform = ImageTransform(
            size=image_size, mean=CLIP_MEAN, std=CLIP_STD, train=for_training
        )

        if for_training:
            # training never reads the taxonomy strings — skip decoding
            # 4x|split| HDF5 string columns (~1M dicts on the full split)
            self.labels = (
                np.arange(len(self)) if labels is None else np.asarray(labels)
            )
        else:
            self.label_dicts = self._load_label_dicts()
            self.labels = self.label_dicts

    def _load_label_dicts(self) -> list[dict[str, str]]:
        out = []
        n = len(self.data["image"])
        decoded = {}
        for level in LEVELS:
            if level in self.data:
                decoded[level] = [
                    v.decode("utf-8") if isinstance(v, bytes) else str(v)
                    for v in self.data[level][:]
                ]
            else:
                decoded[level] = ["unknown"] * n
        return [
            {level: decoded[level][i] for level in LEVELS} for i in range(n)
        ]

    def __len__(self) -> int:
        return len(self.data["image"])

    def _image_bytes(self, idx: int) -> bytes:
        enc = self.data["image"][idx].astype(np.uint8)
        length = int(self.data["image_mask"][idx])
        return enc[:length].tobytes()

    def __getitem__(self, idx: int) -> Example:
        if self.image_input_type == "image":
            from mmlearn_tpu.datasets.builtin.image_utils import (
                decode_transform_jpeg,
            )

            image = decode_transform_jpeg(
                self._image_bytes(idx), self.transform
            ).astype(np.float32)
        else:
            image = self.data["image_features"][idx].astype(np.float32)

        if self.dna_input_type == "sequence":
            barcode = self.data["barcode"][idx]
            barcode = barcode.decode("utf-8") if isinstance(barcode, bytes) else barcode
            dna = self.dna_processor(barcode)
        else:
            dna = self.data["dna_features"][idx].astype(np.float32)

        pid_key = "processid" if self.variant == "5m" else "image_file"
        process_id = self.data[pid_key][idx]
        process_id = (
            process_id.decode("utf-8") if isinstance(process_id, bytes) else process_id
        )

        example = Example(
            {
                EXAMPLE_INDEX_KEY: idx,
                Modalities.rgb.name: image,
                Modalities.dna.name: dna,
                Modalities.text.name: np.asarray(
                    self.data["language_tokens_input_ids"][idx], np.int32
                ),
                "language_token_type_ids": np.asarray(
                    self.data["language_tokens_token_type_ids"][idx], np.int32
                ),
                Modalities.text.attention_mask: np.asarray(
                    self.data["language_tokens_attention_mask"][idx], np.int32
                ),
                "process_id": process_id,
                "split": self.split,
            }
        )
        if self.for_training:
            example["labels"] = int(self.labels[idx])
        else:
            example["labels"] = self.labels[idx]  # taxonomy dict (strings)
        return example
