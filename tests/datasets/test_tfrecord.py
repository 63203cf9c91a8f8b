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


def _write_shard(path, examples):
    from mmlearn_tpu.datasets.core.tfrecord import encode_tf_example, write_tfrecord

    return write_tfrecord(str(path), (encode_tf_example(e) for e in examples))


class TestTFRecordDataset:
    def _make_shards(self, tmp_path, sizes=(3, 2)):
        paths = []
        k = 0
        for i, n in enumerate(sizes):
            p = tmp_path / f"shard-{i}.tfrecord"
            _write_shard(
                p,
                [
                    {"label": np.asarray([k + j], np.int64), "name": f"ex{k + j}"}
                    for j in range(n)
                ],
            )
            k += n
            paths.append(str(p))
        return paths

    def test_indexed_random_access(self, tmp_path):
        from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
        from mmlearn_tpu.datasets.core import TFRecordDataset

        ds = TFRecordDataset(self._make_shards(tmp_path), verify_crc=True)
        assert len(ds) == 5
        # cross-shard access in arbitrary order
        for idx in (4, 0, 3, 2, 1, -1):
            ex = ds[idx]
            want = idx % 5
            assert int(ex["label"][0]) == want
            assert ex["name"] == [f"ex{want}".encode()]
            assert ex[EXAMPLE_INDEX_KEY] == want
        with pytest.raises(IndexError):
            ds[5]

    def test_index_cache_roundtrip(self, tmp_path):
        from mmlearn_tpu.datasets.core import TFRecordDataset
        from mmlearn_tpu.datasets.core.tfrecord import tfrecord_index

        paths = self._make_shards(tmp_path, sizes=(4,))
        ix1 = tfrecord_index(paths[0])
        assert (tmp_path / "shard-0.tfrecord.idx.npz").exists()
        ix2 = tfrecord_index(paths[0])  # cache hit
        np.testing.assert_array_equal(ix1, ix2)
        # stale cache (rewritten shard) is ignored and rebuilt
        import os
        import time

        _write_shard(paths[0], [{"label": np.asarray([7], np.int64)}])
        os.utime(paths[0], (time.time() + 5, time.time() + 5))
        ds = TFRecordDataset(paths)
        assert len(ds) == 1
        assert int(ds[0]["label"][0]) == 7

    def test_corrupt_record_detected(self, tmp_path):
        from mmlearn_tpu.datasets.core import TFRecordDataset

        paths = self._make_shards(tmp_path, sizes=(2,))
        raw = bytearray(open(paths[0], "rb").read())
        raw[-6] ^= 0xFF  # flip a byte inside the last record's payload
        open(paths[0], "wb").write(bytes(raw))
        ds = TFRecordDataset(paths, verify_crc=True, index_cache=False)
        ds[0]  # first record untouched
        with pytest.raises(ValueError, match="corrupt record data"):
            ds[1]

    def test_to_example_and_sampler_compose(self, tmp_path):
        from mmlearn_tpu.datasets.core import (
            CombinedDataset,
            DataLoader,
            Example,
            TFRecordDataset,
        )

        ds = TFRecordDataset(
            self._make_shards(tmp_path),
            to_example=lambda d: Example({"y": np.asarray(d["label"], np.int64)}),
        )
        loader = DataLoader(CombinedDataset([ds]), batch_size=5, shuffle=False)
        (batch,) = list(loader)
        np.testing.assert_array_equal(np.sort(np.ravel(batch["y"])), range(5))
