"""Gradient accumulation (optax.MultiSteps) semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmlearn_tpu.tasks.base import TrainingTask


class QuadraticTask(TrainingTask):
    """Deterministic toy task: loss = mean((w·x - y)^2) over the batch."""

    def init_params(self, rng, sample_batch):
        return {"w": jnp.zeros(4)}

    def loss_fn(self, params, batch, rng, extras=None, deterministic=False):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, ({"loss": loss}, dict(extras or {}))


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 4)).astype(np.float32)
    w_true = np.asarray([1.0, -2.0, 0.5, 3.0], np.float32)
    y = x @ w_true
    return x, y


@pytest.mark.integration_test
def test_accumulation_matches_large_batch():
    x, y = _data(32)
    task = QuadraticTask(optimizer=functools.partial(optax.sgd, learning_rate=0.1))

    def run(accum, micro):
        tx = task.configure_optimizers()
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        params = task.init_params(jax.random.key(0), None)
        opt_state = tx.init(params)
        n_micro = len(x) // micro
        for i in range(n_micro):
            b = {"x": jnp.asarray(x[i * micro : (i + 1) * micro]),
                 "y": jnp.asarray(y[i * micro : (i + 1) * micro])}
            grads = jax.grad(lambda p: task.loss_fn(p, b, None)[0])(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return np.asarray(params["w"])

    # 2 optimizer updates either way: (accum=2, micro=8) vs (accum=1, micro=16)
    w_accum = run(accum=2, micro=8)
    w_large = run(accum=1, micro=16)
    np.testing.assert_allclose(w_accum, w_large, rtol=1e-5)


@pytest.mark.integration_test
def test_trainer_accumulation_runs():
    from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
    from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader, Example
    from mmlearn_tpu.trainer import Trainer

    from tests.tasks.test_end_to_end import LossRecorder, PairedDataset, _tiny_task

    ds = CombinedDataset([PairedDataset(size=64)])
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)
    task = _tiny_task()
    rec = LossRecorder()
    trainer = Trainer(
        max_steps=12, log_every_n_steps=1, callbacks=[rec], seed=0,
        accumulate_grad_batches=3,
        default_root_dir="/tmp/mmlearn_test_accum",
    )
    state = trainer.fit(task, loader)
    assert int(state.step) == 12  # micro-steps counted
    assert np.isfinite(rec.losses).all()


class CountingEMATask(QuadraticTask):
    """Tracks post_update invocations + the step values passed in."""

    def init_extras(self, params):
        return {"ema_w": jnp.array(params["w"]),
                "n_updates": jnp.zeros((), jnp.int32),
                "last_step": jnp.full((), -1, jnp.int32)}

    def post_update(self, params, extras, step):
        new = dict(extras)
        new["ema_w"] = 0.5 * extras["ema_w"] + 0.5 * params["w"]
        new["n_updates"] = extras["n_updates"] + 1
        new["last_step"] = jnp.asarray(step, jnp.int32)
        return new


@pytest.mark.integration_test
def test_ema_updates_once_per_optimizer_step():
    """With accumulate_grad_batches=k the EMA (post_update) must fire once
    per optimizer step, not per micro-step, and receive the optimizer-step
    counter (reference cadence: mmlearn/tasks/ijepa.py:108-115 updates EMA in
    on_before_zero_grad, which Lightning calls once per optimizer step)."""
    from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
    from mmlearn_tpu.trainer import Trainer

    x, y = _data(32)

    from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
    from mmlearn_tpu.datasets.core.example import Example

    class ArrayDataset:
        def __len__(self):
            return len(x)

        def __getitem__(self, i):
            return Example({"x": x[i], "y": y[i], EXAMPLE_INDEX_KEY: i})

    task = CountingEMATask(
        optimizer=functools.partial(optax.sgd, learning_rate=0.1)
    )
    loader = DataLoader(CombinedDataset([ArrayDataset()]), batch_size=4,
                        drop_last=True)
    trainer = Trainer(
        max_steps=8, accumulate_grad_batches=4, log_every_n_steps=100,
        default_root_dir="/tmp/mmlearn_test_ema_accum",
    )
    state = trainer.fit(task, loader)
    # 8 micro-steps / k=4 -> exactly 2 optimizer steps -> 2 EMA updates
    assert int(state.extras["n_updates"]) == 2
    # the step passed to post_update counts optimizer steps (0-based)
    assert int(state.extras["last_step"]) == 1

    # without accumulation, every step is an optimizer step
    task2 = CountingEMATask(
        optimizer=functools.partial(optax.sgd, learning_rate=0.1)
    )
    trainer2 = Trainer(
        max_steps=8, accumulate_grad_batches=1, log_every_n_steps=100,
        default_root_dir="/tmp/mmlearn_test_ema_noaccum",
    )
    state2 = trainer2.fit(task2, loader)
    assert int(state2.extras["n_updates"]) == 8
