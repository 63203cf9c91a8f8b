"""Trainer behavior tests: val intervals, LR monitor, precision casting,
batch validation."""

import numpy as np
import pytest

from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
from mmlearn_tpu.trainer import LearningRateMonitor, Timer, Trainer
from mmlearn_tpu.trainer.trainer import validate_batch_shapes

from tests.tasks.test_end_to_end import LossRecorder, PairedDataset, _tiny_task


class ValCounter:
    def __init__(self):
        self.steps = []

    def on_train_start(self, trainer): ...
    def on_train_batch_end(self, trainer, metrics, step): ...
    def on_train_epoch_end(self, trainer, epoch): ...
    def on_validation_end(self, trainer, metrics, step):
        self.steps.append(step)
    def on_train_end(self, trainer): ...


@pytest.mark.integration_test
def test_val_check_interval():
    ds = CombinedDataset([PairedDataset(size=64)])
    train = DataLoader(ds, batch_size=16, drop_last=True)
    val = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    counter = ValCounter()
    trainer = Trainer(
        max_steps=9, val_check_interval=3, log_every_n_steps=1, seed=0,
        callbacks=[counter], limit_val_batches=1,
        default_root_dir="/tmp/mmlearn_test_vci",
    )
    trainer.fit(task, train, val)
    assert counter.steps == [3, 6, 9]


@pytest.mark.integration_test
def test_lr_monitor_and_timer():
    ds = CombinedDataset([PairedDataset(size=32)])
    loader = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    rec = LossRecorder()
    metrics_seen = {}

    class Capture(LossRecorder):
        def on_train_batch_end(self, trainer, metrics, step):
            super().on_train_batch_end(trainer, metrics, step)
            metrics_seen.update(metrics)

    trainer = Trainer(
        max_steps=4, log_every_n_steps=1, seed=0,
        callbacks=[LearningRateMonitor(), Timer(), Capture()],
        default_root_dir="/tmp/mmlearn_test_lrmon",
    )
    trainer.fit(task, loader)
    assert "lr" in metrics_seen and metrics_seen["lr"] > 0
    assert "steps_per_sec" in metrics_seen


@pytest.mark.integration_test
def test_log_mfu_metrics(monkeypatch):
    """log_mfu=True logs achieved TFLOP/s from the analytic jaxpr counter,
    and MFU when the chip peak is known (MMLEARN_PEAK_TFLOPS for CPU)."""
    monkeypatch.setenv("MMLEARN_PEAK_TFLOPS", "0.5")
    ds = CombinedDataset([PairedDataset(size=32)])
    loader = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    metrics_seen = {}

    class Capture(LossRecorder):
        def on_train_batch_end(self, trainer, metrics, step):
            super().on_train_batch_end(trainer, metrics, step)
            metrics_seen.update(metrics)

    trainer = Trainer(
        max_steps=3, log_every_n_steps=1, seed=0, log_mfu=True,
        callbacks=[Capture()], default_root_dir="/tmp/mmlearn_test_mfu",
    )
    trainer.fit(task, loader)
    assert trainer._step_flops and trainer._step_flops > 0
    assert metrics_seen.get("tflops_per_sec", 0) > 0
    assert 0 < metrics_seen["mfu"] == pytest.approx(
        metrics_seen["tflops_per_sec"] / (0.5 * trainer.mesh.size)
    )

    # the analytic counter is GLOBAL (logical computation): sharding must
    # not change the figure, and the count must be exact for a known bmm
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mmlearn_tpu.trainer.trainer import _compiled_step_flops

    x = np.zeros((8, 64, 64), np.float32)
    bmm = lambda a: jnp.einsum("bij,bjk->bik", a, a)  # noqa: E731
    flops_1 = _compiled_step_flops(jax.jit(bmm), x)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    sharded = jax.jit(
        bmm, in_shardings=NamedSharding(mesh, P("data"))
    )
    flops_4 = _compiled_step_flops(sharded, x)
    assert flops_1 == 2 * 8 * 64**3
    assert flops_4 == flops_1


def test_analytic_flops_counts_scan_and_pallas():
    """The XLA cost-analysis failure modes the analytic counter exists for
    (measured on TPU: scan bodies counted once, Pallas kernels zero):
    scan×length equals the unrolled count, and in-kernel dots are counted
    grid× (mmlearn_tpu/trainer/flops.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mmlearn_tpu.trainer.flops import step_flops

    x = np.zeros((64, 64), np.float32)
    w = np.zeros((64, 64), np.float32)

    def scanned(x, w):
        y, _ = lax.scan(lambda c, _: (jnp.tanh(c @ w), None), x, None, length=12)
        return y

    def unrolled(x, w):
        for _ in range(12):
            x = jnp.tanh(x @ w)
        return x

    expect = 12 * 2 * 64**3
    assert step_flops(scanned, x, w) == expect
    assert step_flops(unrolled, x, w) == expect

    # grad of a remat'd scan: recompute counted (3x fwd matmul work for
    # fwd+recompute+bwd-dots is a lower bound)
    def loss(w):
        return scanned(x, w).sum()

    g = step_flops(jax.grad(loss), w)
    assert g >= 3 * expect * 0.9

    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...])

    @jax.jit
    def pallas_mm(a, b):
        return pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[
                pl.BlockSpec((32, 64), lambda i: (i, 0)),
                pl.BlockSpec((64, 64), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((32, 64), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((64, 64), jnp.float32),
        )(a, b)

    # grid 2 × (2·32·64·64) = full 2·64³
    assert step_flops(pallas_mm, x, w) == 2 * 64**3


def test_compilation_cache_dir(tmp_path):
    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        Trainer(
            max_steps=1, compilation_cache_dir=str(tmp_path / "xla_cache"),
            default_root_dir=str(tmp_path),
        )
        assert jax.config.jax_compilation_cache_dir == str(
            tmp_path / "xla_cache"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


@pytest.mark.integration_test
def test_bf16_precision_input_cast():
    import jax.numpy as jnp

    ds = CombinedDataset([PairedDataset(size=32)])
    loader = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    rec = LossRecorder()
    trainer = Trainer(
        max_steps=2, log_every_n_steps=1, precision="bf16", seed=0,
        callbacks=[rec], default_root_dir="/tmp/mmlearn_test_bf16",
    )
    state = trainer.fit(task, loader)
    assert np.isfinite(rec.losses).all()
    # params stay f32 (precision only casts float inputs)
    import jax

    assert jax.tree.leaves(state.params)[0].dtype == jnp.float32


def test_validate_batch_shapes_errors():
    good = {"rgb": np.zeros((4, 2, 2)), "text": np.zeros((4, 3))}
    assert validate_batch_shapes(good) == 4
    with pytest.raises(ValueError, match="inconsistent batch dims"):
        validate_batch_shapes({"rgb": np.zeros((4, 2)), "text": np.zeros((3, 2))})
    with pytest.raises(ValueError, match="object dtype"):
        validate_batch_shapes({"rgb": np.asarray([object()], dtype=object)})
    # aux arrays with non-batch leading dims are fine
    ok = {"rgb": np.zeros((4, 2)), "ijepa_encoder_masks": np.zeros((1, 4, 5))}
    assert validate_batch_shapes(ok) == 4


@pytest.mark.integration_test
def test_fast_dev_run_and_flag_aliases(tmp_path):
    """Lightning-surface flags added in round 3 (PARITY.md trainer table):
    fast_dev_run runs exactly N batches with checkpointing disabled;
    fp16 precision aliases to bf16-mixed; gradient_clip_algorithm='value'
    clips elementwise."""
    from mmlearn_tpu.trainer.callbacks import ModelCheckpoint

    ds = CombinedDataset([PairedDataset(size=32)])
    train = DataLoader(ds, batch_size=16, drop_last=True)
    val = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    rec = LossRecorder()
    trainer = Trainer(
        fast_dev_run=True, log_every_n_steps=1, seed=0,
        callbacks=[ModelCheckpoint(dirpath=str(tmp_path)), rec],
        default_root_dir=str(tmp_path),
    )
    state = trainer.fit(task, train, val)
    assert int(state.step) == 1
    assert len(rec.losses) == 1
    # ModelCheckpoint was dropped: nothing written
    import os

    assert not any(
        name.isdigit() for name in os.listdir(tmp_path)
    ), os.listdir(tmp_path)

    t2 = Trainer(precision="16-mixed", default_root_dir=str(tmp_path))
    assert t2.precision == "bf16-mixed"

    with pytest.raises(ValueError, match="gradient_clip_algorithm"):
        Trainer(gradient_clip_algorithm="nope")

    task3 = _tiny_task()
    t3 = Trainer(
        max_steps=2, log_every_n_steps=1, seed=0,
        gradient_clip_val=1e-7, gradient_clip_algorithm="value",
        callbacks=[rec], default_root_dir=str(tmp_path),
    )
    # value-clip path compiles and trains
    state3 = t3.fit(task3, train)
    assert int(state3.step) == 2


@pytest.mark.integration_test
def test_sigterm_graceful_stop_and_resume(tmp_path):
    """Preemption handling (Lightning parity: Trainer.should_stop + signal
    handling): SIGTERM mid-training ends the run cleanly after the in-flight
    step, the end-of-train checkpoint is written, and resuming completes the
    run with the same final state as an uninterrupted one."""
    import os
    import signal

    import jax

    from mmlearn_tpu.trainer.callbacks import ModelCheckpoint

    def loaders():
        ds = CombinedDataset([PairedDataset(size=64)])
        return DataLoader(ds, batch_size=16, drop_last=True)

    class KillAt(LossRecorder):
        def __init__(self, at_step):
            super().__init__()
            self.at_step = at_step

        def on_train_batch_end(self, trainer, metrics, step):
            super().on_train_batch_end(trainer, metrics, step)
            if step == self.at_step:
                os.kill(os.getpid(), signal.SIGTERM)

    # uninterrupted reference run
    ref_rec = LossRecorder()
    ref_state = Trainer(
        max_steps=6, log_every_n_steps=1, seed=0, callbacks=[ref_rec],
        default_root_dir=str(tmp_path / "ref"),
    ).fit(_tiny_task(), loaders())

    # interrupted at step 3 — handler must stop the loop cleanly
    ck = tmp_path / "ckpt"
    rec1 = KillAt(3)
    t1 = Trainer(
        max_steps=6, log_every_n_steps=1, seed=0,
        callbacks=[ModelCheckpoint(dirpath=str(ck), async_save=False), rec1],
        default_root_dir=str(tmp_path / "run"),
    )
    state1 = t1.fit(_tiny_task(), loaders())
    assert int(state1.step) == 3
    assert len(rec1.losses) == 3
    # fit restored the previous SIGTERM disposition on exit
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler,
    )

    # resume completes the run and matches the uninterrupted trajectory
    rec2 = LossRecorder()
    t2 = Trainer(
        max_steps=6, log_every_n_steps=1, seed=0,
        callbacks=[ModelCheckpoint(dirpath=str(ck), async_save=False), rec2],
        default_root_dir=str(tmp_path / "run2"),
    )
    state2 = t2.fit(_tiny_task(), loaders(), ckpt_path="last")
    assert int(state2.step) == 6
    np.testing.assert_allclose(
        np.asarray(rec1.losses + rec2.losses), np.asarray(ref_rec.losses),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(state2.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


@pytest.mark.integration_test
def test_should_stop_flag_stops_training(tmp_path):
    class StopAt(LossRecorder):
        def on_train_batch_end(self, trainer, metrics, step):
            super().on_train_batch_end(trainer, metrics, step)
            if step == 2:
                trainer.should_stop = True

    ds = CombinedDataset([PairedDataset(size=64)])
    loader = DataLoader(ds, batch_size=16, drop_last=True)
    rec = StopAt()
    state = Trainer(
        max_steps=10, log_every_n_steps=1, seed=0, callbacks=[rec],
        default_root_dir=str(tmp_path),
    ).fit(_tiny_task(), loader)
    assert int(state.step) == 2
    assert len(rec.losses) == 2


@pytest.mark.integration_test
def test_tensorboard_logger_writes_events(tmp_path):
    """TensorBoardLogger (Lightning's default logger) writes scalar events
    under the Lightning directory convention save_dir/name/version_n."""
    from mmlearn_tpu.trainer import TensorBoardLogger

    ds = CombinedDataset([PairedDataset(size=32)])
    loader = DataLoader(ds, batch_size=16, drop_last=True)
    tb = TensorBoardLogger(save_dir=str(tmp_path), name="tb")
    trainer = Trainer(
        max_steps=3, log_every_n_steps=1, seed=0, loggers=[tb],
        default_root_dir=str(tmp_path),
    )
    trainer.fit(_tiny_task(), loader)

    assert tb.log_dir is not None and tb.log_dir.endswith("version_0")
    import glob

    events = glob.glob(tb.log_dir + "/events.out.tfevents.*")
    assert events, "no event file written"

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb.log_dir)
    acc.Reload()
    assert "train/loss" in acc.Tags()["scalars"]
    assert len(acc.Scalars("train/loss")) == 3

    # a second run gets version_1
    tb2 = TensorBoardLogger(save_dir=str(tmp_path), name="tb")
    assert tb2.log_dir.endswith("version_1")
    tb2.finalize()


@pytest.mark.integration_test
def test_lr_monitor_under_grad_accumulation(tmp_path):
    """Under accumulate_grad_batches=k the schedule advances once per k
    micro-batches (optax.MultiSteps); the monitor must log the LR the most
    recent optimizer update actually applied, schedule(step//k - 1)."""
    ds = CombinedDataset([PairedDataset(size=64)])
    loader = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    lrs = {}

    class Capture(LossRecorder):
        def on_train_batch_end(self, trainer, metrics, step):
            super().on_train_batch_end(trainer, metrics, step)
            if "lr" in metrics:
                lrs[step] = metrics["lr"]

    trainer = Trainer(
        max_steps=6, accumulate_grad_batches=2, log_every_n_steps=1, seed=0,
        callbacks=[LearningRateMonitor(), Capture()],
        default_root_dir=str(tmp_path),
    )
    trainer.fit(task, loader)
    sched = trainer._lr_schedule
    assert sched is not None
    for step, got in lrs.items():
        want = float(sched(max(0, step // 2 - 1)))
        assert got == want, (step, got, want)
    # mid-accumulation steps repeat the last applied LR (no k=1 off-by-one)
    assert lrs[2] == lrs[3] and lrs[4] == lrs[5]


def test_limit_batches_zero_disables(tmp_path):
    """Lightning semantics: limit_val_batches=0 disables validation entirely
    (0 previously meant 'no limit' via truthiness)."""
    counter = ValCounter()
    ds = CombinedDataset([PairedDataset(size=32)])
    train_loader = DataLoader(ds, batch_size=8, drop_last=True)
    val_loader = DataLoader(ds, batch_size=8)
    trainer = Trainer(
        max_steps=8, limit_val_batches=0, check_val_every_n_epoch=1,
        callbacks=[counter], default_root_dir=str(tmp_path), seed=0,
    )
    trainer.fit(_tiny_task(), train_loader, val_loader)
    assert counter.steps == []  # validation produced no logged results


def test_overfit_batches(tmp_path):
    """Lightning ``overfit_batches``: the same leading train batches every
    epoch (shuffle downgraded) and validation on those identical batches."""
    from mmlearn_tpu.datasets.core.samplers import SequentialSampler

    ds = CombinedDataset([PairedDataset(size=64)])
    train_loader = DataLoader(ds, batch_size=16, drop_last=True, shuffle=True)
    val_loader = DataLoader(ds, batch_size=16, drop_last=True)

    steps_seen = []

    class StepCounter(LossRecorder):
        def on_train_batch_end(self, trainer, metrics, step):
            super().on_train_batch_end(trainer, metrics, step)
            steps_seen.append(step)

    counter = ValCounter()
    trainer = Trainer(
        max_epochs=2, overfit_batches=2, log_every_n_steps=1, seed=0,
        check_val_every_n_epoch=1, callbacks=[StepCounter(), counter],
        default_root_dir=str(tmp_path),
    )
    trainer.fit(_tiny_task(), train_loader, val_loader)
    # 2 batches per epoch x 2 epochs; validation fired at each epoch end
    assert steps_seen == [1, 2, 3, 4]
    assert counter.steps == [2, 4]
    # the shuffling sampler was replaced so epochs replay identical batches
    assert isinstance(train_loader.sampler, SequentialSampler)
    assert trainer.limit_train_batches == 2
    assert trainer.limit_val_batches == 2


def test_overfit_batches_validation():
    with pytest.raises(ValueError, match="overfit_batches"):
        Trainer(overfit_batches=-1)


def test_overfit_batches_ratio_sampler_epoch_invariant(tmp_path):
    """overfit_batches with the epoch-seeded CombinedDatasetRatioSampler:
    the sampler re-seeds its multinomial draws with seed+epoch regardless of
    ``shuffle``, so the trainer must pin ``set_epoch(0)`` for the replayed
    leading batches to actually be identical across epochs (advisor r4)."""
    from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
    from mmlearn_tpu.datasets.core.samplers import CombinedDatasetRatioSampler

    ds = CombinedDataset([PairedDataset(size=64)])
    sampler = CombinedDatasetRatioSampler(ds, shuffle=True, seed=0)
    train_loader = DataLoader(
        ds, batch_size=16, sampler=sampler, drop_last=True
    )
    task = _tiny_task()
    seen = []
    orig_prepare = task.prepare_batch

    def record(batch, step):
        seen.append(np.asarray(batch[EXAMPLE_INDEX_KEY]).copy())
        return orig_prepare(batch, step)

    task.prepare_batch = record
    trainer = Trainer(
        max_epochs=2, overfit_batches=2, log_every_n_steps=1, seed=0,
        default_root_dir=str(tmp_path),
    )
    trainer.fit(task, train_loader)
    # seen = [shape probe] + 2 batches (epoch 0) + 2 batches (epoch 1);
    # the probe batch is replayed as epoch 0's first batch
    assert len(seen) == 5
    np.testing.assert_array_equal(seen[0], seen[1])
    np.testing.assert_array_equal(seen[1], seen[3])
    np.testing.assert_array_equal(seen[2], seen[4])


@pytest.mark.integration_test
def test_final_epoch_validation_fires(tmp_path):
    """Lightning validates at the end of EVERY completed epoch, including
    the last: the max_epochs step budget running out exactly at the epoch
    boundary must not skip the final epoch-end validation."""
    ds = CombinedDataset([PairedDataset(size=32)])
    train_loader = DataLoader(ds, batch_size=16, drop_last=True)  # 2 batches
    val_loader = DataLoader(ds, batch_size=16, drop_last=True)
    counter = ValCounter()
    trainer = Trainer(
        max_epochs=2, log_every_n_steps=1, seed=0,
        check_val_every_n_epoch=1, callbacks=[counter], limit_val_batches=1,
        default_root_dir=str(tmp_path),
    )
    trainer.fit(_tiny_task(), train_loader, val_loader)
    assert counter.steps == [2, 4]  # both epoch ends, including the final one


def test_limit_batches_float_fractions(tmp_path):
    """Lightning parity: float limit_*_batches are fractions of the sized
    loader, resolved to a static batch count at loop setup."""
    ds = CombinedDataset([PairedDataset(size=32)])
    train_loader = DataLoader(ds, batch_size=8, drop_last=True)  # 4 batches

    steps_seen = []

    class StepCounter(LossRecorder):
        def on_train_batch_end(self, trainer, metrics, step):
            super().on_train_batch_end(trainer, metrics, step)
            steps_seen.append(step)

    trainer = Trainer(
        max_epochs=2, limit_train_batches=0.5, log_every_n_steps=1,
        callbacks=[StepCounter()], default_root_dir=str(tmp_path), seed=0,
    )
    trainer.fit(_tiny_task(), train_loader)
    # 0.5 of 4 batches = 2 per epoch, 2 epochs -> 4 steps total
    assert steps_seen == [1, 2, 3, 4]
    assert trainer._limit_train == 2


def test_val_check_interval_float_fraction(tmp_path):
    """Float val_check_interval = fraction of the training epoch (Lightning
    parity), resolved to a static step interval against the sized loader."""
    ds = CombinedDataset([PairedDataset(size=64)])
    train = DataLoader(ds, batch_size=16, drop_last=True)  # 4 batches/epoch
    val = DataLoader(ds, batch_size=16, drop_last=True)
    counter = ValCounter()
    trainer = Trainer(
        max_steps=8, val_check_interval=0.5, log_every_n_steps=1, seed=0,
        callbacks=[counter], limit_val_batches=1,
        default_root_dir=str(tmp_path),
    )
    trainer.fit(_tiny_task(), train, val)
    # 0.5 of 4 batches/epoch -> every 2 steps
    assert counter.steps == [2, 4, 6, 8]
    with pytest.raises(ValueError, match=r"\(0\.0, 1\.0\]"):
        Trainer(val_check_interval=1.5)._resolve_val_interval(train)


def test_limit_batches_float_validation():
    """Malformed fractions fail loudly at setup, not as silent truthiness."""
    from mmlearn_tpu.trainer.trainer import _resolve_limit

    sized = [0] * 4
    assert _resolve_limit(0.5, sized, "x") == 2
    assert _resolve_limit(1.0, sized, "x") is None  # whole loader
    assert _resolve_limit(0.0, sized, "x") == 0  # phase disabled
    assert _resolve_limit(3, object(), "x") == 3  # ints skip len()
    assert _resolve_limit(None, object(), "x") is None
    with pytest.raises(ValueError, match=r"\[0\.0, 1\.0\]"):
        _resolve_limit(1.5, sized, "limit_train_batches")
    with pytest.raises(ValueError, match="sized dataloader"):
        _resolve_limit(0.5, iter(sized), "limit_train_batches")
    with pytest.raises(ValueError, match="resolves to 0"):
        _resolve_limit(0.1, sized, "limit_train_batches")


def test_resume_fast_forward_skips_dataset_reads(tmp_path):
    """Mid-epoch resume must not load/decode the already-consumed examples
    of a map-style dataset (loader-level skip)."""

    class CountingDataset(PairedDataset):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.reads = 0

        def __getitem__(self, idx):
            self.reads += 1
            return super().__getitem__(idx)

    inner = CountingDataset(size=64)
    ds = CombinedDataset([inner])
    # prefetch_factor=1 → synchronous reads (deterministic read counting;
    # the prefetch path legitimately reads a few batches ahead)
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch_factor=1)

    from mmlearn_tpu.trainer.callbacks import ModelCheckpoint

    # train 4 steps (mid-epoch), checkpoint
    trainer = Trainer(
        max_steps=4, callbacks=[ModelCheckpoint(save_last=True)],
        default_root_dir=str(tmp_path), seed=0, log_every_n_steps=1,
    )
    trainer.fit(_tiny_task(), loader)

    # resume to step 6: must read ONLY the 2 new batches (16 examples)
    # + the shape-probe batch (8) — not the 4 skipped batches
    inner.reads = 0
    trainer2 = Trainer(
        max_steps=6, callbacks=[ModelCheckpoint(save_last=True)],
        default_root_dir=str(tmp_path), seed=0, log_every_n_steps=1,
    )
    state = trainer2.fit(_tiny_task(), loader, ckpt_path="last")
    assert int(state.step) == 6
    assert inner.reads <= 3 * 8, f"fast-forward read {inner.reads} examples"


def test_fit_explicit_ckpt_path_must_exist(tmp_path):
    """fit(ckpt_path=<explicit dir>) fails loudly when nothing restores;
    ckpt_path='last' on a fresh run starts from scratch with a warning."""
    ds = CombinedDataset([PairedDataset(size=16)])
    loader = DataLoader(ds, batch_size=8, drop_last=True)
    trainer = Trainer(max_steps=1, default_root_dir=str(tmp_path), seed=0)
    with pytest.raises(FileNotFoundError):
        trainer.fit(_tiny_task(), loader, ckpt_path=str(tmp_path / "nope"))
    # 'last' without any checkpoint: fresh start, no error
    trainer2 = Trainer(max_steps=1, default_root_dir=str(tmp_path), seed=0)
    state = trainer2.fit(_tiny_task(), loader, ckpt_path="last")
    assert int(state.step) == 1
