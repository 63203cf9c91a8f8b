"""Materialized-corpus path: packed-tensor round trip + loader composition.

This is the pre-processed input path (decode/resize once → TFRecord shards
of raw tensors) that closes the host-decode input gap — see
docs/performance.md "Input pipeline". The reference has no equivalent
(torchvision re-decodes every epoch)."""

from __future__ import annotations
import os

import numpy as np
import pytest

from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
from mmlearn_tpu.datasets.core.tfrecord import read_tfrecord, parse_tf_example
from mmlearn_tpu.datasets.materialize import (
    MaterializedDataset,
    decode_packed,
    encode_packed,
    materialize,
    packed_to_example,
)


def _sample(i: int) -> dict:
    rng = np.random.default_rng(i)
    return {
        "rgb": rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
        "text": rng.integers(0, 100, (16,), dtype=np.int32),
        "score": np.float32(0.5 * i),
        "name": f"sample-{i}",
        "example_index": i,
    }


def test_packed_round_trip():
    s = _sample(3)
    out = decode_packed(parse_tf_example(encode_packed(s)))
    np.testing.assert_array_equal(out["rgb"], s["rgb"])
    assert out["rgb"].dtype == np.uint8
    np.testing.assert_array_equal(out["text"], s["text"])
    assert out["text"].dtype == np.int32
    assert out["score"] == np.float32(1.5) and out["score"].dtype == np.float32
    assert out["name"] == b"sample-3"  # bytes on the wire
    assert out["example_index"] == 3
    # decoded arrays are writable (frombuffer views are copied)
    out["rgb"][0, 0, 0] = 255


def test_packed_rejects_sidecar_collisions_and_object_dtype():
    with pytest.raises(ValueError):
        encode_packed({"x/shape": np.zeros(1)})
    with pytest.raises(TypeError):
        encode_packed({"x": np.asarray([object()])})


def test_materialize_and_dataset(tmp_path):
    res = materialize(
        (_sample(i) for i in range(10)),
        str(tmp_path),
        shard_size=4,
        prefix="train",
    )
    assert res.num_samples == 10
    assert [s.rsplit("/", 1)[-1] for s in res.shards] == [
        "train-00000.tfrecord",
        "train-00001.tfrecord",
        "train-00002.tfrecord",
    ]
    ds = MaterializedDataset(res.shards, verify_crc=True)
    assert len(ds) == 10
    ex = ds[7]
    np.testing.assert_array_equal(ex["rgb"], _sample(7)["rgb"])
    assert int(ex["example_index"]) == 7
    # composes with CombinedDataset + DataLoader + default collator
    combined = CombinedDataset([ds])
    loader = DataLoader(combined, batch_size=5, drop_last=True)
    batch = next(iter(loader))
    assert batch["rgb"].shape == (5, 8, 8, 3)
    assert batch["rgb"].dtype == np.uint8


def test_materialize_rank_split_is_disjoint_and_covering(tmp_path):
    world = 2
    all_shards: list[str] = []
    for rank in range(world):
        res = materialize(
            (_sample(i) for i in range(10)),
            str(tmp_path / f"r{rank}"),
            shard_size=3,
            rank=rank,
            world_size=world,
        )
        all_shards.extend(res.shards)
    seen = []
    for shard in sorted(all_shards, key=lambda p: p.rsplit("/", 1)[-1]):
        for rec in read_tfrecord(shard):
            seen.append(int(decode_packed(parse_tf_example(rec))["example_index"]))
    assert sorted(seen) == list(range(10))


class _CountingMapSource:
    def __init__(self, n):
        self.n = n
        self.reads: list[int] = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.reads.append(i)
        return _sample(i)


def test_materialize_map_style_touches_only_owned_shards(tmp_path):
    """VERDICT r4 item 6: multi-process materialize over a map-style source
    must cost ~N/W per process — non-owned samples are never fetched."""
    world = 2
    all_shards = []
    reads = []
    for rank in range(world):
        src = _CountingMapSource(10)
        res = materialize(
            src, str(tmp_path / f"r{rank}"), shard_size=3,
            rank=rank, world_size=world,
        )
        assert res.num_samples == 10
        reads.append(list(src.reads))
        all_shards.extend(res.shards)
    # shards: 0:[0..2] 1:[3..5] 2:[6..8] 3:[9]; rank0 owns 0,2 rank1 owns 1,3
    assert reads[0] == [0, 1, 2, 6, 7, 8]
    assert reads[1] == [3, 4, 5, 9]
    # disjoint + covering
    seen = []
    for shard in all_shards:
        for rec in read_tfrecord(shard):
            seen.append(
                int(decode_packed(parse_tf_example(rec))["example_index"])
            )
    assert sorted(seen) == list(range(10))
    # byte-identical to the single-process iterator path (same shard
    # boundaries, same packing)
    full = materialize(
        (_sample(i) for i in range(10)), str(tmp_path / "full"), shard_size=3
    )
    by_name = {s.rsplit("/", 1)[-1]: s for s in all_shards}
    for shard in full.shards:
        name = shard.rsplit("/", 1)[-1]
        with open(shard, "rb") as a, open(by_name[name], "rb") as b:
            assert a.read() == b.read(), name


def test_materialize_samples_for_shard_factory(tmp_path):
    """Seekable sources (HDF5 ranges, per-shard files) hand materialize a
    factory; each process calls it only for its own shards."""
    calls = []

    def factory(shard_idx, start, stop):
        calls.append((shard_idx, start, stop))
        return (_sample(i) for i in range(start, stop))

    res = materialize(
        output_dir=str(tmp_path), shard_size=4, num_samples=10,
        samples_for_shard=factory, rank=1, world_size=2,
    )
    assert calls == [(1, 4, 8)]  # shard 1 only (rank 1 of 2; shards 0,1,2)
    assert [s.rsplit("/", 1)[-1] for s in res.shards] == ["train-00001.tfrecord"]
    ids = [
        int(decode_packed(parse_tf_example(rec))["example_index"])
        for rec in read_tfrecord(res.shards[0])
    ]
    assert ids == [4, 5, 6, 7]
    with pytest.raises(ValueError, match="num_samples"):
        materialize(
            output_dir=str(tmp_path / "x"), samples_for_shard=factory
        )


def test_packed_to_example_is_attr_dict():
    ex = packed_to_example(parse_tf_example(encode_packed(_sample(0))))
    assert ex.rgb.shape == (8, 8, 3)


def test_materialize_iterator_packs_reused_buffers_eagerly(tmp_path):
    """A generator that yields views into one reused buffer (the common
    fill-and-yield loader pattern) must serialize each iteration's
    contents — deferring the encode to shard-flush time would write the
    buffer's FINAL contents for every record in the shard."""
    buf = {"rgb": np.zeros((4, 4, 3), np.uint8), "example_index": 0}

    def gen():
        for i in range(6):
            buf["rgb"][:] = i + 1
            buf["example_index"] = i
            yield dict(buf)  # shallow copy: the array is still shared

    res = materialize(gen(), str(tmp_path), shard_size=3, prefix="train")
    assert res.num_samples == 6
    ds = MaterializedDataset(res.shards)
    for i in range(6):
        np.testing.assert_array_equal(
            ds[i]["rgb"], np.full((4, 4, 3), i + 1, np.uint8), err_msg=str(i)
        )


def test_materialize_empty_map_source_writes_no_shards(tmp_path):
    res = materialize([], str(tmp_path), shard_size=4, prefix="train")
    assert res.num_samples == 0
    assert res.shards == []
    assert not any(f.endswith(".tfrecord") for f in os.listdir(tmp_path))
