"""Eval-job path: train → checkpoint → eval from checkpoint via the CLI flow."""

import numpy as np
import pytest

from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
from mmlearn_tpu.trainer import ModelCheckpoint, Trainer

from tests.tasks.test_end_to_end import PairedDataset, _tiny_task


@pytest.mark.integration_test
def test_eval_from_checkpoint(tmp_path):
    ds = CombinedDataset([PairedDataset(size=32)])
    ckpt_dir = str(tmp_path / "ckpts")

    loader = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    trainer = Trainer(
        max_steps=4, log_every_n_steps=1, seed=0,
        callbacks=[ModelCheckpoint(dirpath=ckpt_dir, every_n_epochs=None,
                                   save_last=True)],
        default_root_dir=str(tmp_path),
    )
    trainer.fit(task, loader)

    # fresh trainer, eval-only: restore + test
    task2 = _tiny_task()
    trainer2 = Trainer(
        max_steps=4, seed=0,
        callbacks=[ModelCheckpoint(dirpath=ckpt_dir)],
        default_root_dir=str(tmp_path),
    )
    test_loader = DataLoader(ds, batch_size=16, pad_partial_batches=True)
    state = trainer2.prepare_eval_state(task2, test_loader, ckpt_path="last")
    assert int(state.step) == 4
    results = trainer2.test(task2, test_loader, state=state)
    assert "validation/loss" in results or results  # loss key is phase-named

    # restored params give the same test loss as the training trainer's state
    results_direct = trainer.test(task, test_loader)
    key = next(iter(results_direct))
    np.testing.assert_allclose(results[key], results_direct[key], rtol=1e-5)


@pytest.mark.integration_test
def test_eval_missing_checkpoint_raises(tmp_path):
    ds = CombinedDataset([PairedDataset(size=32)])
    task = _tiny_task()
    trainer = Trainer(seed=0, default_root_dir=str(tmp_path))
    loader = DataLoader(ds, batch_size=16)
    with pytest.raises(FileNotFoundError):
        trainer.prepare_eval_state(task, loader, ckpt_path=str(tmp_path / "none"))
