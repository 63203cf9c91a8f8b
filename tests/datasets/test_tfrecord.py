"""TFRecord codec tests: CRC32C vectors, wire-format golden bytes,
round-trips, corruption detection, StreamingDataset integration."""

import functools

import numpy as np
import pytest

from mmlearn_tpu.datasets.core.streaming import StreamingDataset
from mmlearn_tpu.datasets.core.tfrecord import (
    crc32c,
    encode_tf_example,
    parse_tf_example,
    read_tfrecord,
    tfrecord_open_shard,
    write_tfrecord,
)


def test_crc32c_vectors():
    # RFC 3720 / canonical Castagnoli test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_example_golden_bytes():
    """Hand-computed wire encoding of {'a': b'x'} — guards against silent
    drift from the tf.train.Example proto layout."""
    assert encode_tf_example({"a": b"x"}) == bytes.fromhex(
        "0a0c0a0a0a01611205" "0a030a0178"
    )


def test_example_roundtrip():
    features = {
        "image": b"\xff\xd8jpegbytes",
        "caption": ["a dog", "ein Hund"],
        "label": np.asarray([3, -7, 2**40], np.int64),
        "score": np.asarray([0.5, -1.25], np.float32),
        "flag": True,
        "scalar": 4.5,
    }
    parsed = parse_tf_example(encode_tf_example(features))
    assert parsed["image"] == [b"\xff\xd8jpegbytes"]
    assert parsed["caption"] == [b"a dog", b"ein Hund"]
    np.testing.assert_array_equal(parsed["label"], [3, -7, 2**40])
    assert parsed["label"].dtype == np.int64
    np.testing.assert_array_equal(parsed["score"], [0.5, -1.25])
    assert parsed["score"].dtype == np.float32
    np.testing.assert_array_equal(parsed["flag"], [1])
    np.testing.assert_array_equal(parsed["scalar"], [4.5])


def test_encode_rejects_multidim():
    with pytest.raises(ValueError, match="flat"):
        encode_tf_example({"x": np.zeros((2, 2))})


def test_empty_features_keep_type():
    parsed = parse_tf_example(
        encode_tf_example({
            "tags": [],  # empty plain list = empty BytesList
            "ids": np.asarray([], np.int64),
            "scores": np.asarray([], np.float32),
        })
    )
    assert parsed["tags"] == []
    assert parsed["ids"].dtype == np.int64 and parsed["ids"].size == 0
    assert parsed["scores"].dtype == np.float32 and parsed["scores"].size == 0


def test_malformed_payload_raises_value_error():
    # truncated varint and overrunning length-delimited field must both be
    # ValueError (not a bare IndexError / silent truncation)
    with pytest.raises(ValueError, match="varint"):
        parse_tf_example(b"\x0a\xff")
    with pytest.raises(ValueError, match="overruns"):
        parse_tf_example(b"\x0a\x7fonly-a-few-bytes")


def test_tfrecord_file_roundtrip(tmp_path):
    path = str(tmp_path / "shard-0.tfrecord")
    records = [
        encode_tf_example({"idx": np.asarray([i]), "payload": bytes([i]) * i})
        for i in range(1, 6)
    ]
    assert write_tfrecord(path, iter(records)) == 5
    back = list(read_tfrecord(path))
    assert back == records
    parsed = [parse_tf_example(r) for r in back]
    assert [int(p["idx"][0]) for p in parsed] == [1, 2, 3, 4, 5]


def test_tfrecord_crc_detects_corruption(tmp_path):
    path = str(tmp_path / "bad.tfrecord")
    write_tfrecord(path, iter([encode_tf_example({"a": b"hello"})]))
    raw = bytearray(open(path, "rb").read())
    raw[-6] ^= 0xFF  # flip a data byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc"):
        list(read_tfrecord(path))
    # opt-out still reads the (corrupt) bytes
    assert len(list(read_tfrecord(path, verify_crc=False))) == 1


def test_streaming_dataset_over_tfrecord_shards(tmp_path):
    shards = []
    for s in range(4):
        path = str(tmp_path / f"train-{s}.tfrecord")
        write_tfrecord(
            path,
            iter(
                encode_tf_example({"sid": np.asarray([s * 10 + i])})
                for i in range(3)
            ),
        )
        shards.append(path)

    def collect(rank):
        ds = StreamingDataset(
            shards,
            open_shard=functools.partial(tfrecord_open_shard),
            shuffle_shards=False,
            rank=rank,
            world_size=2,
        )
        return [int(ex["sid"][0]) for ex in ds]

    seen0, seen1 = collect(0), collect(1)
    assert len(seen0) == len(seen1) == 6
    assert set(seen0).isdisjoint(seen1)
    assert set(seen0) | set(seen1) == {
        s * 10 + i for s in range(4) for i in range(3)
    }
