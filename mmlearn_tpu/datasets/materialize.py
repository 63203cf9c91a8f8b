"""Corpus materialization: decode/preprocess ONCE → packed TFRecord shards.

The standard TPU-shop input recipe: run the expensive host work (JPEG
decode, resize, tokenization) a single time offline, persist the result as
TFRecord shards of *packed tensors* (raw little-endian bytes + shape/dtype
sidecar features), and train from those — per-sample read cost collapses to
``pread + CRC-32C + np.frombuffer`` (a memcpy), so even a 1-core host can
feed a TPU chip at full step rate.

The reference framework (pure torch) re-decodes JPEGs every epoch through
torchvision loaders (/root/reference/mmlearn/datasets/imagenet.py wraps
``torchvision.datasets.ImageFolder``); it has no materialized-corpus path.
This module is the TPU-native answer to that host-bound pipeline.

Packed-tensor convention (one ``tf.train.Example`` per sample):

- every ndarray leaf ``k`` is stored as three features:
  ``k`` = BytesList[raw C-order little-endian bytes],
  ``k/shape`` = Int64List, ``k/dtype`` = BytesList[dtype.str, e.g. b'<f4'];
- bytes/str leaves pass through as BytesList;
- python int leaves pass through as Int64List scalars.

:func:`decode_packed` inverts the convention;
:func:`packed_to_example` plugs into
:class:`~mmlearn_tpu.datasets.core.tfrecord.TFRecordDataset` as
``to_example`` so a materialized corpus composes with samplers, ratio
sampling, mid-epoch resume, and the collator exactly like any map-style
dataset.

Multi-process: :func:`materialize` writes shards round-robin by sample
index; pass ``rank``/``world_size`` to split the *write* work across
processes (each process owns a disjoint set of shard files, so there is no
write coordination).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Mapping, Optional, Sequence

import numpy as np

from mmlearn_tpu.datasets.core.example import Example
from mmlearn_tpu.datasets.core.tfrecord import (
    encode_tf_example,
    write_tfrecord,
)

__all__ = [
    "encode_packed",
    "decode_packed",
    "packed_to_example",
    "materialize",
    "MaterializedDataset",
]

_SHAPE = "/shape"
_DTYPE = "/dtype"


def encode_packed(sample: Mapping[str, Any]) -> bytes:
    """One sample (flat ``{key: ndarray|bytes|str|int}``) → serialized
    ``tf.train.Example`` under the packed-tensor convention."""
    feats: dict[str, Any] = {}
    for key, value in sample.items():
        if _SHAPE in key or _DTYPE in key:
            raise ValueError(f"key {key!r} collides with packed sidecars")
        if isinstance(value, (bytes, str)):
            feats[key] = value
            continue
        if isinstance(value, (bool, int, np.integer)):
            feats[key] = int(value)
            continue
        arr = np.asarray(value)
        if arr.dtype == object:
            raise TypeError(f"cannot pack object-dtype leaf {key!r}")
        # canonical little-endian C-order bytes: readable on any host
        arr = np.ascontiguousarray(arr, arr.dtype.newbyteorder("<"))
        feats[key] = arr.tobytes()
        feats[key + _SHAPE] = np.asarray(arr.shape, np.int64)
        feats[key + _DTYPE] = arr.dtype.str.encode()
    return encode_tf_example(feats)


def decode_packed(features: Mapping[str, Any]) -> dict[str, Any]:
    """Parsed feature dict → ``{key: ndarray|bytes|int}`` (inverts
    :func:`encode_packed`). Zero-decode: each tensor is one frombuffer view
    copied into a writable array (a single memcpy)."""
    out: dict[str, Any] = {}
    for key, value in features.items():
        if key.endswith(_SHAPE) or key.endswith(_DTYPE):
            continue
        shape = features.get(key + _SHAPE)
        if shape is not None:
            dtype = np.dtype(features[key + _DTYPE][0].decode())
            raw = value[0] if isinstance(value, list) else value
            arr = np.frombuffer(raw, dtype=dtype).reshape(
                tuple(int(d) for d in shape)
            )
            # writable copy: downstream transforms/collators may mutate
            out[key] = np.array(arr)
            continue
        if isinstance(value, list) and len(value) == 1:
            out[key] = value[0]
        elif isinstance(value, np.ndarray) and value.shape == (1,):
            out[key] = value.item()
        else:
            out[key] = value
    return out


def packed_to_example(features: Mapping[str, Any]) -> Example:
    """``to_example`` adapter for :class:`TFRecordDataset` over a
    materialized corpus."""
    return Example(decode_packed(features))


@dataclass
class MaterializeResult:
    shards: list[str]
    num_samples: int
    num_bytes: int


def materialize(
    samples: Iterable[Mapping[str, Any]],
    output_dir: str,
    *,
    prefix: str = "train",
    shard_size: int = 1024,
    to_features: Optional[Callable[[Any], Mapping[str, Any]]] = None,
    rank: int = 0,
    world_size: int = 1,
) -> MaterializeResult:
    """Write ``samples`` as packed TFRecord shards under ``output_dir``.

    Args:
        samples: iterable of flat sample dicts (or anything, with
            ``to_features`` mapping each item to one). An :class:`Example`
            works as-is (it is a Mapping).
        output_dir: created if missing; shards are named
            ``{prefix}-{i:05d}.tfrecord``.
        shard_size: samples per shard.
        to_features: optional per-item adapter run before packing (e.g.
            apply the train transform once, drop unused keys).
        rank/world_size: this process writes only shards where
            ``shard_index % world_size == rank`` (items outside its shards
            are skipped — pass the SAME iterable on every process).
    """
    os.makedirs(output_dir, exist_ok=True)
    shards: list[str] = []
    num_samples = 0
    num_bytes = 0
    buf: list[bytes] = []
    shard_idx = 0

    def _flush() -> None:
        nonlocal buf, shard_idx, num_bytes
        if buf and shard_idx % world_size == rank:
            path = os.path.join(
                output_dir, f"{prefix}-{shard_idx:05d}.tfrecord"
            )
            write_tfrecord(path, iter(buf))
            shards.append(path)
            num_bytes += os.path.getsize(path)
        buf = []
        shard_idx += 1

    for item in samples:
        if shard_idx % world_size == rank:
            feats = to_features(item) if to_features is not None else item
            buf.append(encode_packed(feats))
        else:
            buf.append(b"")  # placeholder to keep shard boundaries aligned
        num_samples += 1
        if len(buf) >= shard_size:
            _flush()
    _flush()
    return MaterializeResult(
        shards=shards, num_samples=num_samples, num_bytes=num_bytes
    )


def MaterializedDataset(
    shards: Sequence[str], verify_crc: bool = False
) -> "Any":
    """Map-style dataset over a materialized corpus: TFRecordDataset with
    the packed-tensor decoder plugged in."""
    from mmlearn_tpu.datasets.core.tfrecord import TFRecordDataset

    return TFRecordDataset(
        shards, to_example=packed_to_example, verify_crc=verify_crc
    )
