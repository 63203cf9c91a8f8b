"""Concatenation of heterogeneous datasets with provenance stamping.

Behavioral parity with /root/reference/mmlearn/datasets/core/combined_dataset.py:
concatenates map-style and iterable-style datasets, indexes map-style ones via
cumulative-size bisect, consumes iterable ones sequentially with iterator reset
on ``StopIteration`` (reference lines 82-91), and stamps ``dataset_index`` on
every example before triggering ``create_ids()`` (reference lines 105-108).

Datasets here are any objects implementing ``__getitem__``/``__len__``
(map-style) or ``__iter__`` (iterable-style) and returning
:class:`~mmlearn_tpu.datasets.core.example.Example`.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterable, Iterator, Sequence
from typing import Any

import numpy as np

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.core.example import Example


def _is_map_style(dataset: Any) -> bool:
    return hasattr(dataset, "__getitem__") and hasattr(dataset, "__len__")


class CombinedDataset:
    """Combine multiple datasets (map- or iterable-style) into one."""

    def __init__(self, datasets: Sequence[Any] | Iterable[Any]) -> None:
        self.datasets = list(datasets)
        if not self.datasets:
            raise ValueError("CombinedDataset requires at least one dataset")
        for ds in self.datasets:
            if not (_is_map_style(ds) or hasattr(ds, "__iter__")):
                raise TypeError(
                    f"Dataset {ds!r} is neither map-style nor iterable"
                )
        self._iterators: dict[int, Iterator] = {}
        # DataLoader may call __getitem__ from a thread pool; python
        # generators are not re-entrant and the consumption counters must
        # not race
        import threading

        self._iter_lock = threading.Lock()
        # per-stream consumption counters: iterable datasets have no stable
        # per-example index, so examples are stamped with the order this
        # process consumed them (monotonic across iterator resets, so
        # create_ids() never collides)
        self._consumed: dict[int, int] = {}
        self._cumulative_sizes = np.cumsum(
            [self._dataset_len(ds) for ds in self.datasets]
        ).tolist()

    def __getstate__(self) -> dict:
        # grain workers pickle the dataset: drop the (unpicklable) lock and
        # live iterators; each process re-creates them lazily
        state = dict(self.__dict__)
        state["_iter_lock"] = None
        state["_iterators"] = {}
        return state

    def __setstate__(self, state: dict) -> None:
        import threading

        self.__dict__.update(state)
        self._iter_lock = threading.Lock()

    @staticmethod
    def _dataset_len(dataset: Any) -> int:
        if _is_map_style(dataset):
            return len(dataset)
        # iterable-style: honor __len__ if present, else treat as size-1 slot
        # consumed repeatedly (reference uses the same cumulative scheme).
        if hasattr(dataset, "__len__"):
            try:
                return len(dataset)
            except TypeError:  # stream with no declared length
                return 1
        return 1

    def __len__(self) -> int:
        return int(self._cumulative_sizes[-1])

    @property
    def all_map_style(self) -> bool:
        """True when every sub-dataset is map-style: random access has no
        consumption side effects, so loaders may skip fetches entirely
        (fast mid-epoch resume). Iterable sub-datasets advance on every
        ``__getitem__`` — skipping their fetches would desynchronize the
        stream. Recursive: a nested CombinedDataset is map-style itself but
        may wrap streams."""
        return all(
            ds.all_map_style if hasattr(ds, "all_map_style")
            else _is_map_style(ds)
            for ds in self.datasets
        )

    @property
    def cumulative_sizes(self) -> list[int]:
        return list(self._cumulative_sizes)

    def set_epoch(self, epoch: int) -> None:
        """Propagate the epoch to sub-datasets and DROP cached iterators.

        A generator cached from the previous epoch would keep yielding the
        old epoch's shard order after ``set_epoch`` (the stream's reshuffle
        only takes effect on the next ``iter()``).
        """
        with self._iter_lock:
            self._iterators.clear()
        for ds in self.datasets:
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)

    def _next_from_iterable(self, dataset_idx: int) -> Example:
        if dataset_idx not in self._iterators:
            self._iterators[dataset_idx] = iter(self.datasets[dataset_idx])
        try:
            return next(self._iterators[dataset_idx])
        except StopIteration:
            self._iterators[dataset_idx] = iter(self.datasets[dataset_idx])
            return next(self._iterators[dataset_idx])

    def __getitem__(self, idx: int) -> Example:
        if idx < 0:
            idx += len(self)
        if not 0 <= idx < len(self):
            raise IndexError(f"Index {idx} out of range for size {len(self)}")
        dataset_idx = bisect.bisect_right(self._cumulative_sizes, idx)
        sample_idx = idx - (
            self._cumulative_sizes[dataset_idx - 1] if dataset_idx > 0 else 0
        )
        dataset = self.datasets[dataset_idx]
        if _is_map_style(dataset):
            example = dataset[sample_idx]
            fallback_index = sample_idx
        else:
            with self._iter_lock:  # generators are not re-entrant
                example = self._next_from_iterable(dataset_idx)
                fallback_index = self._consumed.get(dataset_idx, 0)
                self._consumed[dataset_idx] = fallback_index + 1

        if not isinstance(example, Example):
            raise TypeError(
                f"Expected datasets to return Example, got {type(example).__name__} "
                f"from dataset {dataset_idx}"
            )
        example["dataset_index"] = dataset_idx
        if EXAMPLE_INDEX_KEY not in example:
            # streaming sources can't know a global index — use the position
            # in this process's consumption order
            example[EXAMPLE_INDEX_KEY] = fallback_index
        example.create_ids()
        return example
