"""Native (C++) host-side components, loaded via ctypes.

``fastloader``: multithreaded JPEG decode + resize + center-crop
(fastloader.cpp). Compiled on first use with g++ against the system libjpeg;
all consumers fall back to the PIL path when the toolchain or library is
unavailable, so the framework stays pure-Python-capable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "fastloader.cpp")
_SO = os.path.join(_THIS_DIR, "libfastloader.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    # compile to a temp path + atomic rename: the module lock is per-process
    # only, and another process dlopen-ing a half-written .so would fail (or
    # crash if it mapped an in-place rewrite)
    tmp = f"{_SO}.build-{os.getpid()}"
    base = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-lpthread",
            "-o", tmp]
    for cmd in (base[:1] + ["-march=native"] + base[1:], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
            return True
        except (subprocess.SubprocessError, FileNotFoundError, OSError) as err:
            last_err = err
    try:
        os.unlink(tmp)
    except OSError:
        pass
    logger.info("fastloader build failed (%s); using PIL fallback", last_err)
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        have_src = os.path.isfile(_SRC)
        stale = (
            have_src
            and os.path.isfile(_SO)
            and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if not os.path.isfile(_SO) or stale:
            # a prebuilt .so without sources (cleaned checkout / wheel) is
            # used as-is; rebuilding requires the source file
            if not have_src or not _build():
                if not os.path.isfile(_SO):
                    return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as err:
            logger.info("fastloader load failed (%s)", err)
            return None
        lib.fl_decode_jpeg_batch.restype = ctypes.c_int
        lib.fl_decode_jpeg_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.fl_decode_jpeg_resize.restype = ctypes.c_int
        lib.fl_decode_jpeg_resize.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.fl_decode_jpeg_train.restype = ctypes.c_int
        lib.fl_decode_jpeg_train.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_uint64,
            ctypes.c_void_p,
        ]
        lib.fl_decode_jpeg_batch_train.restype = ctypes.c_int
        lib.fl_decode_jpeg_batch_train.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        try:  # older prebuilt .so without the symbol: JPEG paths still work
            lib.fl_crc32c.restype = ctypes.c_uint32
            lib.fl_crc32c.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_uint32,
            ]
        except AttributeError:
            pass
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def decode_jpeg_batch(
    jpegs: Sequence[bytes], out_size: int, n_threads: int = 0
) -> np.ndarray:
    """Decode a batch of JPEG byte strings → (N, out_size, out_size, 3) uint8.

    Raises ``RuntimeError`` if the native library is unavailable (callers
    should check :func:`available` and fall back to PIL).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("fastloader native library unavailable")
    n = len(jpegs)
    blob = b"".join(jpegs)
    offsets = np.zeros(n + 1, dtype=np.uintp)
    np.cumsum([len(j) for j in jpegs], out=offsets[1:])
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
    failures = lib.fl_decode_jpeg_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        n,
        out_size,
        out.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    if failures:
        logger.warning("fastloader: %d/%d JPEGs failed to decode", failures, n)
    return out


def decode_jpeg(jpeg: bytes, out_size: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("fastloader native library unavailable")
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    rc = lib.fl_decode_jpeg_resize(
        jpeg, len(jpeg), out_size, out.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        raise ValueError("JPEG decode failed")
    return out


def crc32c_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "fl_crc32c")


def crc32c(data: bytes, crc: int = 0) -> int:
    """Hardware/SIMD CRC-32C (Castagnoli) — TFRecord framing checksums.

    Raises ``RuntimeError`` when the native library (or symbol) is missing;
    callers (``datasets.core.tfrecord``) fall back to the pure-Python table.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "fl_crc32c"):
        raise RuntimeError("fastloader native library unavailable")
    return int(lib.fl_crc32c(data, len(data), crc & 0xFFFFFFFF))


def decode_jpeg_train(
    jpeg: bytes,
    out_size: int,
    scale: tuple[float, float] = (0.6, 1.0),
    hflip_prob: float = 0.5,
    seed: int = 0,
) -> np.ndarray:
    """Train-path decode: random-resized-crop + random hflip (seeded)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("fastloader native library unavailable")
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    rc = lib.fl_decode_jpeg_train(
        jpeg, len(jpeg), out_size, float(scale[0]), float(scale[1]),
        float(hflip_prob), int(seed) & (2**64 - 1),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("JPEG decode failed")
    return out


def decode_jpeg_batch_train(
    jpegs: Sequence[bytes],
    out_size: int,
    seeds: Sequence[int],
    scale: tuple[float, float] = (0.6, 1.0),
    hflip_prob: float = 0.5,
    n_threads: int = 0,
) -> np.ndarray:
    """Batched train-path decode with per-image augmentation seeds."""
    lib = _load()
    if lib is None:
        raise RuntimeError("fastloader native library unavailable")
    n = len(jpegs)
    blob = b"".join(jpegs)
    offsets = np.zeros(n + 1, dtype=np.uintp)
    np.cumsum([len(j) for j in jpegs], out=offsets[1:])
    seed_arr = np.asarray(seeds, dtype=np.uint64)
    if seed_arr.shape != (n,):
        # the C side reads seeds[0..n-1] unconditionally
        raise ValueError(
            f"seeds must have exactly one entry per image: got "
            f"{seed_arr.shape} for {n} images"
        )
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
    failures = lib.fl_decode_jpeg_batch_train(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        n,
        out_size,
        float(scale[0]),
        float(scale[1]),
        float(hflip_prob),
        seed_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    if failures:
        logger.warning("fastloader: %d/%d JPEGs failed to decode", failures, n)
    return out
