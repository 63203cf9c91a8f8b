"""Device-side uint8 normalization: trainer path equals the host-float path."""

import numpy as np
import pytest

from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
from mmlearn_tpu.datasets.core.example import Example
from mmlearn_tpu.trainer import Trainer

from tests.tasks.test_end_to_end import LossRecorder, PairedDataset, _tiny_task

MEAN = (0.2, 0.3, 0.4)
STD = (0.5, 0.6, 0.7)


class Uint8PairedDataset(PairedDataset):
    """PairedDataset whose images arrive as raw uint8 bytes."""

    def __getitem__(self, idx):
        ex = super().__getitem__(idx)
        # quantize the float pattern into [0, 255] bytes
        lo, hi = -3.0, 3.0
        raw = np.clip((ex["rgb"] - lo) / (hi - lo), 0, 1) * 255.0
        ex["rgb"] = raw.astype(np.uint8)
        return ex


class FloatEquivalentDataset(Uint8PairedDataset):
    """Same bytes, normalized on the host with the same stats."""

    def __getitem__(self, idx):
        ex = super().__getitem__(idx)
        x = ex["rgb"].astype(np.float32) / 255.0
        ex["rgb"] = (x - np.asarray(MEAN, np.float32)) / np.asarray(
            STD, np.float32
        )
        return ex


def _fit(dataset, device_normalize, max_steps=4):
    loader = DataLoader(
        CombinedDataset([dataset]), batch_size=16, drop_last=True
    )
    task = _tiny_task()
    rec = LossRecorder()
    trainer = Trainer(
        max_steps=max_steps, log_every_n_steps=1, seed=0, callbacks=[rec],
        default_root_dir="/tmp/mmlearn_test_devnorm",
        device_normalize=device_normalize,
    )
    trainer.fit(task, loader)
    return rec.losses


@pytest.mark.integration_test
def test_uint8_path_matches_host_float_path():
    losses_dev = _fit(
        Uint8PairedDataset(size=32),
        {"rgb": {"mean": MEAN, "std": STD}},
    )
    losses_host = _fit(FloatEquivalentDataset(size=32), None)
    np.testing.assert_allclose(losses_dev, losses_host, rtol=1e-5, atol=1e-5)


@pytest.mark.integration_test
def test_unconfigured_uint8_image_raises():
    with pytest.raises(ValueError, match="device_normalize"):
        _fit(Uint8PairedDataset(size=32), None, max_steps=1)


def test_image_transform_device_normalize_emits_uint8():
    from mmlearn_tpu.datasets.builtin.image_utils import ImageTransform

    img = (np.random.default_rng(0).random((40, 48, 3)) * 255).astype(
        np.uint8
    )
    t = ImageTransform(size=32, device_normalize=True)
    out = t(img)
    assert out.dtype == np.uint8 and out.shape == (32, 32, 3)
    t_f = ImageTransform(size=32)
    assert t_f(img).dtype == np.float32
