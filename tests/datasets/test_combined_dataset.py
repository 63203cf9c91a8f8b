"""Tests for CombinedDataset / samplers / DataLoader."""

import numpy as np
import pytest

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.core import (
    CombinedDataset,
    CombinedDatasetRatioSampler,
    DataLoader,
    DistributedEvalSampler,
    Example,
)


class MapDataset:
    def __init__(self, size, key="rgb", shape=(2,)):
        self.size, self.key, self.shape = size, key, shape

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        return Example(
            {self.key: np.full(self.shape, float(idx)), EXAMPLE_INDEX_KEY: idx}
        )


class IterDataset:
    def __init__(self, size):
        self.size = size

    def __len__(self):
        return self.size

    def __iter__(self):
        for i in range(self.size):
            yield Example({"text": np.full((2,), float(i)), EXAMPLE_INDEX_KEY: i})


def test_combined_indexing_and_stamping():
    ds = CombinedDataset([MapDataset(3), MapDataset(4, key="text")])
    assert len(ds) == 7
    ex = ds[1]
    assert ex["dataset_index"] == 0
    assert "example_ids" in ex
    ex = ds[5]
    assert ex["dataset_index"] == 1
    np.testing.assert_array_equal(ex["example_ids"]["text"], [1, 2])


def test_combined_iterable_reset():
    ds = CombinedDataset([IterDataset(2)])
    # consume more than the iterable's length: iterator resets on StopIteration
    got = [ds[i % 2][EXAMPLE_INDEX_KEY] for i in range(5)]
    assert got == [0, 1, 0, 1, 0]


def test_combined_requires_example():
    class Bad:
        def __len__(self):
            return 1

        def __getitem__(self, idx):
            return {"rgb": np.zeros(2)}

    with pytest.raises(TypeError):
        CombinedDataset([Bad()])[0]


def test_ratio_sampler_single_replica():
    ds = CombinedDataset([MapDataset(100), MapDataset(100, key="text")])
    sampler = CombinedDatasetRatioSampler(
        ds, ratios=[0.8, 0.2], num_samples=100, rank=0, num_replicas=1, seed=0
    )
    indices = list(sampler)
    assert len(indices) == 100
    from_first = sum(1 for i in indices if i < 100)
    assert 65 <= from_first <= 95  # multinomial around 80


def test_ratio_sampler_distributed_disjoint():
    ds = CombinedDataset([MapDataset(64), MapDataset(64, key="text")])
    shards = []
    for rank in range(4):
        s = CombinedDatasetRatioSampler(
            ds, num_samples=64, rank=rank, num_replicas=4, seed=1
        )
        s.set_epoch(0)
        shards.append(list(s))
    assert all(len(s) == 16 for s in shards)
    # same epoch → shards partition the same global order
    all_idx = [i for s in shards for i in s]
    assert len(all_idx) == 64


def test_ratio_sampler_epoch_changes_order():
    ds = CombinedDataset([MapDataset(32)])
    s = CombinedDatasetRatioSampler(ds, rank=0, num_replicas=1, seed=3)
    s.set_epoch(0)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert e0 != e1


def test_eval_sampler_unpadded():
    ds = MapDataset(10)
    lens = []
    seen = []
    for rank in range(3):
        s = DistributedEvalSampler(ds, rank=rank, num_replicas=3)
        idx = list(s)
        assert len(idx) == len(s)
        lens.append(len(idx))
        seen.extend(idx)
    assert sorted(seen) == list(range(10))
    assert lens == [4, 3, 3]  # no padding


def test_dataloader_basic():
    ds = CombinedDataset([MapDataset(10)])
    loader = DataLoader(ds, batch_size=4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["rgb"].shape == (4, 2)


def test_dataloader_pad_partial():
    ds = CombinedDataset([MapDataset(10)])
    loader = DataLoader(ds, batch_size=4, pad_partial_batches=True)
    batches = list(loader)
    assert len(batches) == 3
    last = batches[-1]
    assert last["rgb"].shape == (4, 2)
    np.testing.assert_array_equal(last["batch_validity"], [True, True, False, False])


def test_dataloader_prefetch_matches_sync():
    ds = CombinedDataset([MapDataset(16)])
    sync = list(DataLoader(ds, batch_size=4, prefetch_factor=1))
    pre = list(DataLoader(ds, batch_size=4, prefetch_factor=3, num_workers=2))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a["rgb"], b["rgb"])


def test_dataloader_prefetch_slow_consumer_terminates():
    """Sentinel delivery regression: a consumer slower than the producer
    leaves the bounded queue full when the producer finishes; the sentinel
    must still be delivered (a dropped sentinel deadlocks the final
    ``q.get()``). Run in a watchdog thread so a regression fails fast
    instead of hanging the suite."""
    import threading
    import time

    ds = CombinedDataset([MapDataset(16)])
    got: list = []

    def consume():
        for batch in DataLoader(ds, batch_size=4, prefetch_factor=2,
                                num_workers=2):
            time.sleep(0.05)  # producer finishes + fills the queue
            got.append(batch)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "prefetch iterator never terminated"
    assert len(got) == 4


def test_dataloader_prefetch_early_break_releases_producer():
    """Breaking out of the epoch (limit_train_batches/max_steps) must stop
    the producer thread rather than leave it blocked on a full queue."""
    import threading

    before = threading.active_count()
    ds = CombinedDataset([MapDataset(64)])
    for i, _ in enumerate(
        DataLoader(ds, batch_size=4, prefetch_factor=2, num_workers=2)
    ):
        if i == 1:
            break
    deadline = __import__("time").time() + 30
    while threading.active_count() > before and __import__("time").time() < deadline:
        __import__("time").sleep(0.05)
    assert threading.active_count() <= before


def test_all_map_style_recursive_with_nested_streams():
    """Fast-skip safety flag: nested CombinedDatasets wrapping streams must
    report all_map_style=False (skipping fetches would desync the stream)."""
    from mmlearn_tpu.datasets.core import CombinedDataset

    class MapDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"rgb": i}

    def stream():
        yield from ({"rgb": i} for i in range(4))

    class IterDS:
        def __iter__(self):
            return stream()

    assert CombinedDataset([MapDS()]).all_map_style is True
    assert CombinedDataset([MapDS(), IterDS()]).all_map_style is False
    nested = CombinedDataset([CombinedDataset([MapDS(), IterDS()]), MapDS()])
    assert nested.all_map_style is False
    assert CombinedDataset([CombinedDataset([MapDS()])]).all_map_style is True
