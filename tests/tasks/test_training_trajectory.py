"""End-to-end training-trajectory parity with the torch reference.

The strongest parity evidence in the suite: the reference's *real*
``ContrastivePretraining`` task (loaded from /root/reference with Lightning
stubbed, reference contrastive_pretraining.py:471-505 + base.py:72-157) was
driven for 50 optimizer steps on fixed synthetic data by
``scripts/record_reference_fixtures.py::record_contrastive_trajectory``, and
its per-step loss/LR/logit-scale trajectory and final embeddings were
committed as ``tests/fixtures/reference_contrastive_trajectory.npz``.

This test builds the *same* model in mmlearn_tpu (identical init, loaded from
the fixture), trains it with our ``Trainer`` on the same data in the same
order, and asserts the trajectories match — converting "every unit matches"
into "the framework trains identically".
"""

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmlearn_tpu.modules.encoders.base import EncoderOutput
from mmlearn_tpu.modules.lr_schedulers import linear_warmup_cosine_annealing_lr
from mmlearn_tpu.tasks import ContrastivePretraining
from mmlearn_tpu.trainer import Trainer
from mmlearn_tpu.trainer.callbacks import LearningRateMonitor

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures",
    "reference_contrastive_trajectory.npz",
)

# must match scripts/record_reference_fixtures.py::TRAJ
TRAJ = dict(
    d_rgb=32, d_txt=24, hid=48, emb=16, batch=16, n_batches=8, steps=50,
    lr=1e-3, betas=(0.9, 0.98), eps=1e-8, weight_decay=0.1,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
)


def make_trajectory_data():
    """Identical to the recorder's data generation (seeded)."""
    rng = np.random.default_rng(1234)
    c = TRAJ
    rgb = rng.standard_normal(
        (c["n_batches"], c["batch"], c["d_rgb"])
    ).astype(np.float32)
    txt = rng.standard_normal(
        (c["n_batches"], c["batch"], c["d_txt"])
    ).astype(np.float32)
    probe_rgb = rng.standard_normal((c["batch"], c["d_rgb"])).astype(np.float32)
    probe_txt = rng.standard_normal((c["batch"], c["d_txt"])).astype(np.float32)
    ids = np.stack(
        [np.zeros(c["batch"], np.int64), np.arange(c["batch"], dtype=np.int64)],
        axis=1,
    )
    return rgb, txt, probe_rgb, probe_txt, ids


class MLPEncoder(nn.Module):
    """Two-layer MLP mirroring the recorder's torch MLPEncoder, initialized
    from the recorded torch weights (torch Linear weight is (out, in) →
    flax Dense kernel is its transpose). GELU is exact (erf), matching
    torch.nn.functional.gelu's default."""

    w1: np.ndarray
    b1: np.ndarray
    w2: np.ndarray
    b2: np.ndarray

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(
            self.w1.shape[0],
            kernel_init=lambda *_: jnp.asarray(self.w1.T),
            bias_init=lambda *_: jnp.asarray(self.b1),
        )(x)
        h = jax.nn.gelu(h, approximate=False)
        y = nn.Dense(
            self.w2.shape[0],
            kernel_init=lambda *_: jnp.asarray(self.w2.T),
            bias_init=lambda *_: jnp.asarray(self.b2),
        )(h)
        return EncoderOutput(last_hidden_state=y[:, None, :], pooler_output=y)


class FixedLoader:
    """Yields precomputed raw batches in a fixed order every epoch."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter([dict(b) for b in self.batches])


class Recorder:
    def __init__(self):
        self.losses, self.scales, self.lrs = [], [], []

    def on_train_start(self, trainer): ...

    def on_train_batch_end(self, trainer, metrics, step):
        if "loss" in metrics:
            self.losses.append(metrics["loss"])
            self.scales.append(metrics["logit_scale"])
        if "lr" in metrics:
            self.lrs.append(metrics["lr"])

    def on_train_epoch_end(self, trainer, epoch): ...

    def on_validation_end(self, trainer, metrics, step): ...

    def on_train_end(self, trainer): ...


@pytest.mark.integration_test
def test_contrastive_training_trajectory_matches_reference(tmp_path):
    fx = np.load(FIXTURE)
    c = TRAJ
    rgb, txt, probe_rgb, probe_txt, ids = make_trajectory_data()

    encoders = {
        "rgb": MLPEncoder(
            w1=fx["w_rgb.fc1.weight"], b1=fx["w_rgb.fc1.bias"],
            w2=fx["w_rgb.fc2.weight"], b2=fx["w_rgb.fc2.bias"],
        ),
        "text": MLPEncoder(
            w1=fx["w_text.fc1.weight"], b1=fx["w_text.fc1.bias"],
            w2=fx["w_text.fc2.weight"], b2=fx["w_text.fc2.bias"],
        ),
    }
    task = ContrastivePretraining(
        encoders=encoders,
        optimizer=functools.partial(
            optax.adamw, b1=c["betas"][0], b2=c["betas"][1], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler=functools.partial(
            linear_warmup_cosine_annealing_lr, base_lr=c["lr"],
            warmup_steps=c["warmup_steps"], max_steps=c["steps"],
            start_factor=c["start_factor"], eta_min=c["eta_min"],
        ),
    )

    batches = [
        {
            "rgb": rgb[i], "text": txt[i],
            "example_ids": {"rgb": ids, "text": ids},
        }
        for i in range(c["n_batches"])
    ]
    rec = Recorder()
    trainer = Trainer(
        max_steps=c["steps"], log_every_n_steps=1,
        callbacks=[LearningRateMonitor(), rec],  # monitor stamps lr first
        mesh_shape={"data": 1},
        default_root_dir=str(tmp_path), seed=0,
    )
    state = trainer.fit(task, FixedLoader(batches))
    assert int(state.step) == c["steps"]
    assert len(rec.losses) == c["steps"]

    ref_losses = fx["losses"]
    got = np.asarray(rec.losses)
    # identical math modulo matmul reduction order (XLA vs torch MKL);
    # drift compounds over 50 AdamW steps, so tolerance widens with depth
    np.testing.assert_allclose(got[:10], ref_losses[:10], rtol=1e-4)
    np.testing.assert_allclose(got, ref_losses, rtol=5e-3)

    # LR trajectory must be Lightning's SequentialLR sequence (f32 schedule
    # vs the reference's f64 torch schedule)
    np.testing.assert_allclose(np.asarray(rec.lrs), fx["lrs"], rtol=1e-4)

    # logit-scale trajectory (pre-update exp(clamped log scale) per step)
    np.testing.assert_allclose(
        np.asarray(rec.scales), np.exp(fx["log_scales"]), rtol=5e-3
    )

    # final embeddings on a held-out probe batch
    probe = {"rgb": jnp.asarray(probe_rgb), "text": jnp.asarray(probe_txt)}
    out = task.forward(state.params, probe, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["rgb_embedding"]), fx["final_rgb"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["text_embedding"]), fx["final_text"], atol=2e-3
    )
