"""Materialized-corpus path: packed-tensor round trip + loader composition.

This is the pre-processed input path (decode/resize once → TFRecord shards
of raw tensors) that closes the host-decode input gap — see
docs/performance.md "Input pipeline". The reference has no equivalent
(torchvision re-decodes every epoch)."""

from __future__ import annotations

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


def test_packed_to_example_is_attr_dict():
    ex = packed_to_example(parse_tf_example(encode_packed(_sample(0))))
    assert ex.rgb.shape == (8, 8, 3)
