"""Streaming dataset: multi-host shard assignment, epoch reshuffle, e2e."""

import json

import numpy as np
import pytest

from mmlearn_tpu.datasets.core import (
    CombinedDataset,
    DataLoader,
    StreamingDataset,
    jsonl_open_shard,
)
from mmlearn_tpu.datasets.core.example import Example


def _shards(n_shards=8, per_shard=4):
    return [
        [f"s{s}e{i}" for i in range(per_shard)] for s in range(n_shards)
    ]


def _open(shard):
    for item in shard:
        yield Example({"text": item})


def _collect(ds):
    return [ex["text"] for ex in ds]


def test_ranks_partition_disjointly_and_cover():
    shards = _shards()
    seen = []
    for rank in range(4):
        ds = StreamingDataset(
            shards, _open, rank=rank, world_size=4, shuffle_shards=False
        )
        seen.append(set(_collect(ds)))
    union = set().union(*seen)
    assert union == {x for s in shards for x in s}
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (seen[a] & seen[b])


def test_epoch_reshuffles_shards_deterministically():
    shards = _shards()
    ds = StreamingDataset(shards, _open, rank=0, world_size=2, seed=3)
    e0 = _collect(ds)
    ds.set_epoch(1)
    e1 = _collect(ds)
    ds.set_epoch(0)
    assert _collect(ds) == e0  # deterministic replay
    assert e0 != e1  # different shard order
    # same global examples per rank-pair across epochs (disjointness holds)
    ds_r1 = StreamingDataset(shards, _open, rank=1, world_size=2, seed=3)
    ds_r1.set_epoch(1)
    assert not (set(e1) & set(_collect(ds_r1)))


def test_shuffle_buffer_is_a_permutation():
    shards = _shards(2, 16)
    ds = StreamingDataset(
        shards, _open, rank=0, world_size=1, shuffle_shards=False,
        shuffle_buffer=8, seed=0,
    )
    out = _collect(ds)
    inorder = [x for s in shards for x in s]
    assert sorted(out) == sorted(inorder)
    assert out != inorder


def test_infinite_auto_advances_epoch():
    shards = _shards(4, 2)
    ds = StreamingDataset(
        shards, _open, rank=0, world_size=2, seed=1, infinite=True
    )
    it = iter(ds)
    per_pass = 2 * 2  # 2 shards of 2 examples per rank
    p1 = [next(it)["text"] for _ in range(per_pass)]
    p2 = [next(it)["text"] for _ in range(per_pass)]
    assert sorted(p1) != sorted(p2) or p1 != p2  # reshuffled wrap


def test_requires_enough_shards():
    with pytest.raises(ValueError, match="cannot cover"):
        StreamingDataset(_shards(2), _open, rank=0, world_size=4)


def test_jsonl_shards_through_loader(tmp_path):
    paths = []
    for s in range(4):
        p = tmp_path / f"shard{s}.jsonl"
        with open(p, "w") as f:
            for i in range(6):
                f.write(json.dumps({"text": f"s{s}e{i}", "label": s}) + "\n")
        paths.append(str(p))

    ds = StreamingDataset(
        paths, jsonl_open_shard, rank=0, world_size=1, shuffle_shards=False,
        length=24,
    )
    combined = CombinedDataset([ds])
    loader = DataLoader(combined, batch_size=6, drop_last=True)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["label"].shape == (6,)
    # set_epoch reaches the streaming dataset through the loader
    loader.set_epoch(5)
    assert ds.epoch == 5
