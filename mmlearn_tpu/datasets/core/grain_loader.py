"""Grain-backed data loader (multiprocess host input pipeline).

The built-in :class:`~mmlearn_tpu.datasets.core.loader.DataLoader` prefetches
with threads — enough for array-backed datasets, but python-bound decode work
(JPEG, tokenization) wants real processes. This adapter runs the same
map-style dataset + sampler + collator stack under `grain.DataLoader` with
``worker_count`` subprocesses, emitting identical collated numpy batches.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=N)``
multiprocessing behavior (SURVEY.md §2.8 "per-host Grain-style sharded input
pipeline").
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Optional

import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.datasets.core.data_collator import DefaultDataCollator
from mmlearn_tpu.datasets.core.loader import _BATCH_VALIDITY_KEY


class _SamplerIndexSource:
    """Expose one epoch of sampler indices as a grain RandomAccessDataSource."""

    def __init__(self, dataset: Any, indices: list[int]) -> None:
        self._dataset = dataset
        self._indices = indices

    def __len__(self) -> int:
        return len(self._indices)

    def __getitem__(self, i: int) -> Any:
        return self._dataset[self._indices[i]]


@store(group="dataloader", name="GrainDataLoader", populate_full_signature=False)
class GrainDataLoader:
    """Multiprocess loader with the same interface as ``DataLoader``."""

    def __init__(
        self,
        dataset: Any = None,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler: Optional[Any] = None,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        num_workers: int = 4,
        prefetch_factor: int = 2,
        pad_partial_batches: bool = False,
        seed: int = 0,
    ) -> None:
        from mmlearn_tpu.datasets.core.samplers import (
            RandomSampler,
            SequentialSampler,
        )

        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.drop_last = drop_last
        self.pad_partial_batches = pad_partial_batches
        self.collate_fn = collate_fn or DefaultDataCollator()
        self.num_workers = max(0, int(num_workers))
        self.prefetch_factor = max(1, int(prefetch_factor))
        if sampler is not None:
            self.sampler = sampler
        elif shuffle:
            self.sampler = RandomSampler(dataset, seed=seed)
        else:
            self.sampler = SequentialSampler(dataset)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
        # streaming/iterable (sub-)datasets reshuffle per epoch; plain
        # samplers don't reach them (same contract as DataLoader.set_epoch)
        from mmlearn_tpu.datasets.core.loader import _propagate_set_epoch

        _propagate_set_epoch(self.dataset, epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, Any]]:
        import grain

        indices = list(self.sampler)
        source = _SamplerIndexSource(self.dataset, indices)
        ds = grain.MapDataset.source(source)
        it = ds.to_iter_dataset()
        if self.num_workers > 0:
            if not getattr(self.dataset, "all_map_style", True):
                # each grain worker gets a PICKLED COPY of the dataset: an
                # iterable sub-dataset's stream would restart from position
                # 0 in every worker — early examples duplicated num_workers
                # times, the tail never read. No error would surface.
                raise ValueError(
                    "GrainDataLoader(num_workers>0) cannot multiprocess a "
                    "dataset with iterable/streaming sub-datasets (each "
                    "worker would replay the stream from the start). Use "
                    "num_workers=0 or the threaded DataLoader."
                )
            it = it.mp_prefetch(
                grain.MultiprocessingOptions(
                    num_workers=self.num_workers,
                    per_worker_buffer_size=self.prefetch_factor,
                )
            )

        batch: list[Any] = []
        for example in it:
            batch.append(example)
            if len(batch) == self.batch_size:
                yield self._collate(batch, n_real=self.batch_size)
                batch = []
        if batch and not self.drop_last:
            n_real = len(batch)
            if self.pad_partial_batches:
                batch = batch + [batch[-1]] * (self.batch_size - n_real)
            yield self._collate(batch, n_real=n_real)

    def _collate(self, examples: list, n_real: int) -> dict[str, Any]:
        out = self.collate_fn(examples)
        if self.pad_partial_batches:
            validity = np.zeros(len(examples), dtype=bool)
            validity[:n_real] = True
            out[_BATCH_VALIDITY_KEY] = validity
        return out
