"""GrainDataLoader parity with the thread-based DataLoader."""

import numpy as np
import pytest

from mmlearn_tpu.datasets.builtin.synthetic import SyntheticImageText
from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
from mmlearn_tpu.datasets.core.grain_loader import GrainDataLoader


def _dataset():
    return CombinedDataset(
        [SyntheticImageText(size=20, image_size=8, seq_len=4, vocab_size=16,
                            num_classes=4)]
    )


def test_grain_loader_inline_parity():
    ds = _dataset()
    ref = list(DataLoader(ds, batch_size=8, pad_partial_batches=True))
    got = list(GrainDataLoader(ds, batch_size=8, num_workers=0,
                               pad_partial_batches=True))
    assert len(got) == len(ref) == 3
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        np.testing.assert_array_equal(a["batch_validity"], b["batch_validity"])


@pytest.mark.integration_test
def test_grain_loader_multiprocess_parity():
    ds = _dataset()
    ref = list(DataLoader(ds, batch_size=8, drop_last=True))
    got = list(GrainDataLoader(ds, batch_size=8, num_workers=2, drop_last=True))
    assert len(got) == len(ref) == 2
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        np.testing.assert_array_equal(a["text"], b["text"])


def test_grain_loader_epoch_shuffle():
    ds = _dataset()
    loader = GrainDataLoader(ds, batch_size=8, shuffle=True, num_workers=0,
                             drop_last=True)
    loader.set_epoch(0)
    e0 = np.concatenate([b["example_index"] for b in loader])
    loader.set_epoch(1)
    e1 = np.concatenate([b["example_index"] for b in loader])
    assert not np.array_equal(e0, e1)


@pytest.mark.integration_test
def test_grain_loader_through_trainer():
    """The Grain loader drives a full Trainer fit like the default loader."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tests.tasks.test_end_to_end import LossRecorder, PairedDataset, _tiny_task

    from mmlearn_tpu.trainer import Trainer

    ds = CombinedDataset([PairedDataset(size=32)])
    loader = GrainDataLoader(ds, batch_size=16, shuffle=True, num_workers=0,
                             drop_last=True)
    rec = LossRecorder()
    trainer = Trainer(max_steps=4, log_every_n_steps=1, callbacks=[rec],
                      seed=0, default_root_dir="/tmp/mmlearn_test_grain")
    state = trainer.fit(_tiny_task(), loader)
    assert int(state.step) == 4
    assert np.isfinite(rec.losses).all()
