"""Tests for the native C++ JPEG fastloader (vs PIL reference)."""

import io
import time

import numpy as np
import pytest

from mmlearn_tpu import native


def _make_jpegs(n=8, w=64, h=48, quality=90):
    from PIL import Image

    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
        out.append(buf.getvalue())
    return out


@pytest.mark.integration_test
def test_fastloader_builds_and_decodes():
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")
    jpegs = _make_jpegs(n=6)
    out = native.decode_jpeg_batch(jpegs, out_size=32, n_threads=3)
    assert out.shape == (6, 32, 32, 3)
    assert out.dtype == np.uint8
    assert out.std() > 1.0  # actually decoded something


@pytest.mark.integration_test
def test_fastloader_matches_cv2_bilinear():
    """Native resize is point-sampled bilinear — cv2.INTER_LINEAR semantics
    (PIL.BILINEAR is an antialiasing filter and differs on high frequencies)."""
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    # smooth gradient image: resize-convention differences stay sub-pixel
    h, w = 60, 80
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [255 * yy / h, 255 * xx / w, 128 + 60 * np.sin(xx / 9.0)], axis=-1
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    data = buf.getvalue()
    size = 32

    ours = native.decode_jpeg_batch([data], out_size=size)[0]
    with Image.open(io.BytesIO(data)) as img:
        decoded = np.asarray(img.convert("RGB"))
    short = min(w, h)
    nw, nh = round(w * size / short), round(h * size / short)
    resized = cv2.resize(decoded, (nw, nh), interpolation=cv2.INTER_LINEAR)
    left, top = (nw - size) // 2, (nh - size) // 2
    ref = resized[top : top + size, left : left + size]
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.median(diff) <= 1
    assert diff.mean() < 3


@pytest.mark.integration_test
def test_fastloader_bad_jpeg_zeroed():
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")
    jpegs = _make_jpegs(n=2)
    out = native.decode_jpeg_batch([jpegs[0], b"not a jpeg"], out_size=16)
    assert out[0].std() > 0
    assert (out[1] == 0).all()


@pytest.mark.integration_test
def test_native_train_decode_seeded_and_shaped():
    """Train-path decode: random-resized-crop + hflip, deterministic per
    seed, distinct across seeds."""
    from mmlearn_tpu import native

    if not native.available():
        pytest.skip("native fastloader unavailable")
    jpeg = _make_jpegs(n=1, w=96, h=72)[0]
    a = native.decode_jpeg_train(jpeg, 48, seed=11)
    b = native.decode_jpeg_train(jpeg, 48, seed=11)
    c = native.decode_jpeg_train(jpeg, 48, seed=12)
    assert a.shape == (48, 48, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    batch = native.decode_jpeg_batch_train(
        [jpeg] * 3, 48, seeds=[5, 6, 5], n_threads=2
    )
    np.testing.assert_array_equal(batch[0], batch[2])
    assert (batch[0] != batch[1]).any()


@pytest.mark.integration_test
def test_dct_scaled_decode_matches_unscaled(monkeypatch):
    """DCT-domain scaled decode (large sources decoded at 1/2 / 1/4 / 1/8)
    stays visually identical to the full-res decode+resample path, and the
    train-path crop geometry is unchanged (drawn against full-res dims)."""
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")
    from PIL import Image

    # big smooth source so 1/2-scale decode actually triggers (crop short
    # side >= 2*224)
    h, w, size = 768, 1024, 224
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [255 * yy / h, 255 * xx / w, 128 + 60 * np.sin(xx / 37.0)], axis=-1
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    data = buf.getvalue()

    monkeypatch.setenv("MMLEARN_FASTLOADER_NO_DCT_SCALE", "1")
    ref_eval = native.decode_jpeg(data, size)
    ref_train = native.decode_jpeg_train(data, size, seed=7)
    monkeypatch.delenv("MMLEARN_FASTLOADER_NO_DCT_SCALE")
    scaled_eval = native.decode_jpeg(data, size)
    scaled_train = native.decode_jpeg_train(data, size, seed=7)

    for ours, ref in ((scaled_eval, ref_eval), (scaled_train, ref_train)):
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.median(diff) <= 1
        assert diff.mean() < 3


@pytest.mark.integration_test
def test_decode_transform_jpeg_train_uses_native(monkeypatch):
    """ImageTransform(train=True) rides the fused native decode and stays
    normalized like the PIL path."""
    from mmlearn_tpu import native
    from mmlearn_tpu.datasets.builtin.image_utils import (
        ImageTransform,
        decode_transform_jpeg,
    )

    if not native.available():
        pytest.skip("native fastloader unavailable")
    jpeg = _make_jpegs(n=1, w=100, h=80)[0]
    t = ImageTransform(size=32, train=True)
    rng = np.random.default_rng(0)
    out = decode_transform_jpeg(jpeg, t, rng=rng)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    # normalized output: roughly centered values, not raw uint8
    assert np.abs(out).max() < 10


@pytest.mark.integration_test
def test_native_crc32c_matches_python():
    if not native.available() or not native.crc32c_available():
        pytest.skip("native crc32c unavailable")
    from mmlearn_tpu.datasets.core.tfrecord import _crc32c_py

    # RFC 3720 test vector
    assert native.crc32c(b"123456789") == 0xE3069283
    rng = np.random.default_rng(42)
    for size in (0, 1, 7, 8, 9, 63, 64, 1024, 4097):
        data = rng.integers(0, 256, size).astype(np.uint8).tobytes()
        assert native.crc32c(data) == _crc32c_py(data), size
    # continuation semantics: crc of the prefix feeds the suffix call
    data = rng.integers(0, 256, 333).astype(np.uint8).tobytes()
    split = native.crc32c(data[200:], native.crc32c(data[:200]))
    assert split == _crc32c_py(data)


def test_tfrecord_crc_dispatch_env(monkeypatch):
    """MMLEARN_TFRECORD_PYCRC=1 pins the Python path; the public crc32c
    agrees with the reference implementation either way."""
    import mmlearn_tpu.datasets.core.tfrecord as tfr

    monkeypatch.setattr(tfr, "_NATIVE_CRC_CHECKED", False)
    monkeypatch.setattr(tfr, "_NATIVE_CRC", None)
    monkeypatch.setenv("MMLEARN_TFRECORD_PYCRC", "1")
    assert tfr.crc32c(b"123456789") == 0xE3069283
    assert tfr._NATIVE_CRC is None
    # re-enable auto-detection for the rest of the session
    monkeypatch.setenv("MMLEARN_TFRECORD_PYCRC", "0")
    monkeypatch.setattr(tfr, "_NATIVE_CRC_CHECKED", False)
    assert tfr.crc32c(b"123456789") == 0xE3069283
