"""``Example`` container and cross-modal id matching.

Behavioral parity with /root/reference/mmlearn/datasets/core/example.py:
an ordered mapping with attribute access, ``create_ids()`` stamping
``example_ids[key] = [dataset_index, example_index]`` per modality key
(reference lines 41-79), and :func:`find_matching_indices` pairing two id
arrays by broadcast comparison (reference lines 101-166). Arrays are numpy
(host-side); device arrays enter the picture only after collation.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

import numpy as np

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY


class Example(OrderedDict):
    """An ordered dict with attribute-style access for a single example."""

    def __init__(self, init_dict: dict | None = None) -> None:
        super().__init__()
        if init_dict:
            for key, value in init_dict.items():
                self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            raise AttributeError(f"Example has no attribute '{key}'") from None

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def create_ids(self) -> None:
        """Stamp per-key ``(dataset_index, example_index)`` id pairs.

        Ids are created for every key except the reserved ones (reference
        semantics, example.py:41-79 — bioscan's eval matches on
        ``example_ids["split"]``). Requires ``example_index`` and
        ``dataset_index`` keys (set by the dataset and
        :class:`~mmlearn_tpu.datasets.core.combined_dataset.CombinedDataset`).
        """
        if EXAMPLE_INDEX_KEY not in self or "dataset_index" not in self:
            raise ValueError(
                "Cannot create ids: 'example_index' and 'dataset_index' "
                "must both be set on the example first."
            )
        idx = np.asarray(
            [int(self["dataset_index"]), int(self[EXAMPLE_INDEX_KEY])],
            dtype=np.int64,
        )
        self["example_ids"] = {
            key: idx
            for key in self.keys()
            if key not in ("example_ids", EXAMPLE_INDEX_KEY, "dataset_index")
        }


def find_matching_indices(
    first_example_ids: np.ndarray, second_example_ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Find row indices where two ``(N, 2)``/``(M, 2)`` id arrays match.

    Returns ``(indices_into_first, indices_into_second)`` such that
    ``first_example_ids[i] == second_example_ids[j]`` pairwise.
    Reference: /root/reference/mmlearn/datasets/core/example.py:101-166.
    """
    first = np.asarray(first_example_ids)
    second = np.asarray(second_example_ids)
    if first.ndim != 2 or first.shape[-1] != 2:
        raise ValueError(
            f"Expected first_example_ids of shape (N, 2), got {first.shape}"
        )
    if second.ndim != 2 or second.shape[-1] != 2:
        raise ValueError(
            f"Expected second_example_ids of shape (M, 2), got {second.shape}"
        )
    matches = (first[:, None, :] == second[None, :, :]).all(axis=-1)
    # (-1, -1) is the collator's "modality absent" sentinel
    # (data_collator.py) — two examples both missing a modality must NOT
    # match each other
    valid = (first >= 0).all(axis=-1)[:, None] & (second >= 0).all(
        axis=-1
    )[None, :]
    matches &= valid
    first_idx, second_idx = np.nonzero(matches)
    return first_idx.astype(np.int64), second_idx.astype(np.int64)
