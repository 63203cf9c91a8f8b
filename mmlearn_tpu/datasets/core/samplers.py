"""Host-side samplers, including distributed-aware ratio sampling.

Behavioral parity with /root/reference/mmlearn/datasets/core/samplers.py.
In the TPU build each *host* (``jax.process_index()``) loads the shard of the
global batch that lands on its local devices, so ``rank``/``num_replicas``
default to the JAX process coordinates instead of ``torch.distributed`` ranks.
All sampling runs in numpy with explicitly epoch-seeded generators so every
host draws identical global orders and takes disjoint strided shards
(reference scheme: ``indices[rank::num_replicas]``, samplers.py:230).
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Optional, Sequence

import numpy as np

from mmlearn_tpu.conf import store
from mmlearn_tpu.datasets.core.combined_dataset import CombinedDataset


def _default_rank_and_replicas(
    rank: Optional[int], num_replicas: Optional[int]
) -> tuple[int, int]:
    if rank is not None and num_replicas is not None:
        return rank, num_replicas
    try:
        import jax

        return (
            rank if rank is not None else jax.process_index(),
            num_replicas if num_replicas is not None else jax.process_count(),
        )
    except Exception:
        return rank or 0, num_replicas or 1


class SequentialSampler:
    """Yield ``range(len(dataset))``."""

    def __init__(self, dataset: Any) -> None:
        self.dataset = dataset

    def __iter__(self) -> Iterator[int]:
        return iter(range(len(self.dataset)))

    def __len__(self) -> int:
        return len(self.dataset)

    def set_epoch(self, epoch: int) -> None:  # noqa: D102 - protocol no-op
        pass


class RandomSampler:
    """Epoch-seeded random permutation sampler."""

    def __init__(self, dataset: Any, seed: int = 0) -> None:
        self.dataset = dataset
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed + self.epoch)
        return iter(rng.permutation(len(self.dataset)).tolist())

    def __len__(self) -> int:
        return len(self.dataset)


@store(group="dataloader/sampler", name="CombinedDatasetRatioSampler")
class CombinedDatasetRatioSampler:
    """Weighted sampling across the sub-datasets of a :class:`CombinedDataset`.

    Reference: /root/reference/mmlearn/datasets/core/samplers.py:14-260.
    Per epoch: multinomial per-dataset draw counts sized by normalized ratios,
    per-dataset index sampling (with or without replacement), pad/trim to a
    ``total_size`` divisible by ``num_replicas``, epoch-seeded shuffle, then a
    rank-strided subsample so each host sees a disjoint shard.
    """

    def __init__(
        self,
        dataset: Optional[CombinedDataset] = None,
        ratios: Optional[Sequence[float]] = None,
        num_samples: Optional[int] = None,
        replacement: bool = False,
        shuffle: bool = True,
        rank: Optional[int] = None,
        num_replicas: Optional[int] = None,
        drop_last: bool = False,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.ratios = list(ratios) if ratios is not None else None
        self._requested_num_samples = num_samples
        self.replacement = replacement
        self.shuffle = shuffle
        self.rank, self.num_replicas = _default_rank_and_replicas(rank, num_replicas)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        if dataset is not None:
            self._validate()

    def _validate(self) -> None:
        if not isinstance(self.dataset, CombinedDataset):
            raise TypeError(
                "CombinedDatasetRatioSampler requires a CombinedDataset, got "
                f"{type(self.dataset).__name__}"
            )
        n = len(self.dataset.datasets)
        if self.ratios is None:
            # reference default: each dataset's LENGTH is its ratio
            # (size-proportional sampling, reference samplers.py:23-27) —
            # uniform would oversample small datasets by orders of magnitude
            from mmlearn_tpu.datasets.core.combined_dataset import (
                CombinedDataset as _CD,
            )

            self.ratios = [
                float(_CD._dataset_len(ds)) for ds in self.dataset.datasets
            ]
        if len(self.ratios) != n:
            raise ValueError(
                f"Got {len(self.ratios)} ratios for {n} datasets"
            )
        total = float(sum(self.ratios))
        self.ratios = [r / total for r in self.ratios]

    @property
    def total_num_samples(self) -> int:
        n = (
            self._requested_num_samples
            if self._requested_num_samples is not None
            else len(self.dataset)
        )
        if self.drop_last:
            return (n // self.num_replicas) * self.num_replicas
        return int(math.ceil(n / self.num_replicas)) * self.num_replicas

    @property
    def num_samples(self) -> int:
        return self.total_num_samples // self.num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        # Propagate into sub-datasets that support it (reference propagates
        # set_epoch into HF iterable datasets, samplers.py:241-260).
        for ds in self.dataset.datasets:
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)

    def _global_indices(self) -> np.ndarray:
        rng = np.random.default_rng(self.seed + self.epoch)
        total = self.total_num_samples
        counts = rng.multinomial(total, self.ratios)
        cumsizes = [0] + self.dataset.cumulative_sizes
        chunks = []
        for ds_idx, count in enumerate(counts):
            lo, hi = cumsizes[ds_idx], cumsizes[ds_idx + 1]
            size = hi - lo
            if count == 0 or size == 0:
                continue
            if self.replacement or count > size:
                draws = rng.integers(0, size, size=count)
            else:
                draws = rng.permutation(size)[:count]
            chunks.append(draws + lo)
        indices = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int64)
        # pad / trim to exactly total_size
        if len(indices) < total:
            pad = indices[: total - len(indices)]
            while len(indices) + len(pad) < total and len(indices) > 0:
                pad = np.concatenate([pad, indices])[: total - len(indices)]
            indices = np.concatenate([indices, pad])
        indices = indices[:total]
        if self.shuffle:
            rng.shuffle(indices)
        return indices

    def __iter__(self) -> Iterator[int]:
        indices = self._global_indices()
        shard = indices[self.rank :: self.num_replicas]
        return iter(shard.tolist())

    def __len__(self) -> int:
        return self.num_samples


@store(group="dataloader/sampler", name="DistributedEvalSampler")
class DistributedEvalSampler:
    """Unpadded distributed sampler for exact evaluation.

    Unlike training samplers this does **not** pad to divisibility, so ranks
    may process different numbers of examples; only use for evaluation
    (reference warning: samplers.py:288-291). With the TPU trainer, the last
    partial device batch is padded with a validity mask instead.
    """

    def __init__(
        self,
        dataset: Optional[Any] = None,
        shuffle: bool = False,
        rank: Optional[int] = None,
        num_replicas: Optional[int] = None,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.shuffle = shuffle
        self.rank, self.num_replicas = _default_rank_and_replicas(rank, num_replicas)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _global_indices(self) -> np.ndarray:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(indices)
        return indices

    def __iter__(self) -> Iterator[int]:
        return iter(self._global_indices()[self.rank :: self.num_replicas].tolist())

    def __len__(self) -> int:
        total = len(self.dataset)
        return (total - self.rank + self.num_replicas - 1) // self.num_replicas
