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
        if "logit_scale" in metrics:
            self.scales.append(metrics["logit_scale"])
        if "lr" in metrics:
            self.lrs.append(metrics["lr"])

    def on_train_epoch_end(self, trainer, epoch): ...

    def on_validation_end(self, trainer, metrics, step): ...

    def on_train_end(self, trainer): ...


IJEPA_FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures",
    "reference_ijepa_trajectory.npz",
)

# must match scripts/record_reference_fixtures.py::IJEPA_TRAJ
IJEPA_TRAJ = dict(
    img=64, patch=16, embed_dim=32, depth=2, num_heads=4,
    pred_embed_dim=16, pred_depth=1, batch=8, n_batches=6, steps=30,
    lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.05,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
    ema_decay=0.996, ema_decay_end=1.0, ema_anneal_end_step=100,
)


def make_ijepa_data():
    """Identical to the recorder's data generation (seeded, NCHW)."""
    rng = np.random.default_rng(4321)
    c = IJEPA_TRAJ
    return rng.standard_normal(
        (c["n_batches"], c["batch"], 3, c["img"], c["img"])
    ).astype(np.float32)


def _binary_masks_to_indices(binary, batch):
    """(n_masks, N) binary rows → (n_masks, B, K) index arrays (our static-
    shape apply_masks format; reference uses boolean selection which keeps
    row-major = sorted order)."""
    idx = [np.flatnonzero(row) for row in binary]
    k = len(idx[0])
    assert all(len(x) == k for x in idx), "reference masks share K per call"
    arr = np.stack(idx).astype(np.int32)  # (n_masks, K)
    return np.broadcast_to(arr[:, None, :], (arr.shape[0], batch, k)).copy()


@pytest.mark.integration_test
def test_ijepa_training_trajectory_matches_reference(tmp_path):
    from mmlearn_tpu.hf_utils import convert_ijepa_predictor, convert_ijepa_vit
    from mmlearn_tpu.modules.encoders.vision import (
        VisionTransformer,
        VisionTransformerPredictor,
    )
    from mmlearn_tpu.tasks import IJEPA
    from mmlearn_tpu.tasks.ijepa import ENCODER_MASK_KEY, PREDICTOR_MASK_KEY

    fx = np.load(IJEPA_FIXTURE)
    c = IJEPA_TRAJ
    images = make_ijepa_data()

    enc_sd = {
        k[len("enc_"):]: fx[k] for k in fx.files if k.startswith("enc_masks_") is False and k.startswith("enc_")
    }
    pred_sd = {
        k[len("pred_"):]: fx[k]
        for k in fx.files
        if k.startswith("pred_masks_") is False and k.startswith("pred_")
    }
    enc_params = convert_ijepa_vit(enc_sd, c["depth"], c["num_heads"])
    pred_params = convert_ijepa_predictor(
        pred_sd, c["pred_depth"], c["num_heads"]
    )
    enc_masks = [
        _binary_masks_to_indices(fx[f"enc_masks_{s}"], c["batch"])
        for s in range(c["steps"])
    ]
    pred_masks = [
        _binary_masks_to_indices(fx[f"pred_masks_{s}"], c["batch"])
        for s in range(c["steps"])
    ]

    class ReplayIJEPA(IJEPA):
        """IJEPA with converted-identical init and recorded-mask replay."""

        def init_params(self, rng, sample_batch):
            fresh = super().init_params(rng, sample_batch)
            loaded = {
                "encoder": jax.tree.map(jnp.asarray, enc_params),
                "predictor": jax.tree.map(jnp.asarray, pred_params),
            }
            assert (
                jax.tree.structure(fresh) == jax.tree.structure(loaded)
            ), "converted param tree structure must match module init"
            return loaded

        def prepare_batch(self, batch, step, training=True):
            batch = dict(batch)
            batch[ENCODER_MASK_KEY] = enc_masks[min(step, c["steps"] - 1)]
            batch[PREDICTOR_MASK_KEY] = pred_masks[min(step, c["steps"] - 1)]
            return batch

    encoder = VisionTransformer(
        img_size=c["img"], patch_size=c["patch"], embed_dim=c["embed_dim"],
        depth=c["depth"], num_heads=c["num_heads"], norm_eps=1e-5,
        use_cls_token=False, global_pool="none",
    )
    predictor = VisionTransformerPredictor(
        num_patches=(c["img"] // c["patch"]) ** 2, embed_dim=c["embed_dim"],
        predictor_embed_dim=c["pred_embed_dim"], depth=c["pred_depth"],
        num_heads=c["num_heads"], norm_eps=1e-5,
    )
    task = ReplayIJEPA(
        encoder=encoder,
        predictor=predictor,
        optimizer=functools.partial(
            optax.adamw, b1=c["betas"][0], b2=c["betas"][1], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler=functools.partial(
            linear_warmup_cosine_annealing_lr, base_lr=c["lr"],
            warmup_steps=c["warmup_steps"], max_steps=c["steps"],
            start_factor=c["start_factor"], eta_min=c["eta_min"],
        ),
        # The reference's EMA teacher is a no-op COPY of the student: its
        # _update_weights iterates state_dict() tensors, which are detached
        # (requires_grad=False), so every param takes the clone() branch
        # (reference ema.py:147-148) regardless of the configured decay.
        # ema_decay=0 reproduces that actual behavior exactly; our default
        # task keeps a real EMA (see PARITY.md "Reference bugs not
        # reproduced"). Diagnosed by one-step param diffing: student params
        # matched at 1e-8 while the teacher was off by exactly the full
        # student update.
        ema_decay=0.0, ema_decay_end=0.0,
        ema_anneal_end_step=c["ema_anneal_end_step"],
    )

    # NCHW (torch layout) → NHWC (ours)
    batches = [
        {"rgb": np.transpose(images[i], (0, 2, 3, 1))}
        for i in range(c["n_batches"])
    ]
    rec = Recorder()
    trainer = Trainer(
        max_steps=c["steps"], log_every_n_steps=1, callbacks=[rec],
        mesh_shape={"data": 1}, default_root_dir=str(tmp_path), seed=0,
    )
    state = trainer.fit(task, FixedLoader(batches))
    assert int(state.step) == c["steps"]

    ref_losses = fx["losses"]
    got = np.asarray(rec.losses)
    # step 0 is pre-update: init conversion + forward must match at f32 level
    np.testing.assert_allclose(got[0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(got[:10], ref_losses[:10], rtol=3e-4)
    np.testing.assert_allclose(got, ref_losses, rtol=5e-3)


MT_FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures",
    "reference_multitask_trajectory.npz",
)

# must match scripts/record_reference_fixtures.py::MT_TRAJ
MT_TRAJ = dict(
    img=64, patch=16, embed_dim=32, depth=2, num_heads=4,
    pred_embed_dim=16, pred_depth=1, d_txt=24, hid=48, emb=16,
    batch=8, n_batches=6, steps=30, aux_weight=0.3,
    lr=1e-3, betas=(0.9, 0.98), eps=1e-8, weight_decay=0.05,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
)


def make_multitask_data():
    """Identical to the recorder's data generation (seeded)."""
    rng = np.random.default_rng(5551)
    c = MT_TRAJ
    rgb = rng.standard_normal(
        (c["n_batches"], c["batch"], 3, c["img"], c["img"])
    ).astype(np.float32)
    txt = rng.standard_normal(
        (c["n_batches"], c["batch"], c["d_txt"])
    ).astype(np.float32)
    ids = np.stack(
        [np.zeros(c["batch"], np.int64), np.arange(c["batch"], dtype=np.int64)],
        axis=1,
    )
    return rgb, txt, ids


@pytest.mark.integration_test
def test_multitask_training_trajectory_matches_reference(tmp_path):
    """The multi_task composition (contrastive ⊃ IJEPA aux on the SHARED rgb
    encoder — reference contrastive_pretraining.py:362-380,:601-640,:507-511,
    the projects/multi_task experiment) trains identically: one param tree,
    gradients from two objectives through the shared encoder, weighted aux
    loss sum, aux EMA at the optimizer boundary. SURVEY.md §7 hard-part #5."""
    from mmlearn_tpu.hf_utils import convert_ijepa_predictor, convert_ijepa_vit
    from mmlearn_tpu.modules.encoders.vision import (
        VisionTransformer,
        VisionTransformerPredictor,
    )
    from mmlearn_tpu.tasks import AuxiliaryTaskSpec, IJEPA
    from mmlearn_tpu.tasks.ijepa import ENCODER_MASK_KEY, PREDICTOR_MASK_KEY

    fx = np.load(MT_FIXTURE)
    c = MT_TRAJ
    rgb, txt, ids = make_multitask_data()

    enc_sd = {
        k[len("enc_"):]: fx[k]
        for k in fx.files
        if k.startswith("enc_") and not k.startswith("enc_masks_")
    }
    pred_sd = {
        k[len("pred_"):]: fx[k]
        for k in fx.files
        if k.startswith("pred_") and not k.startswith("pred_masks_")
    }
    enc_params = convert_ijepa_vit(enc_sd, c["depth"], c["num_heads"])
    pred_params = convert_ijepa_predictor(
        pred_sd, c["pred_depth"], c["num_heads"]
    )
    enc_masks = [
        _binary_masks_to_indices(fx[f"enc_masks_{s}"], c["batch"])
        for s in range(c["steps"])
    ]
    pred_masks = [
        _binary_masks_to_indices(fx[f"pred_masks_{s}"], c["batch"])
        for s in range(c["steps"])
    ]

    class ReplayAuxIJEPA(IJEPA):
        """Aux IJEPA replaying the reference's recorded masks.

        ema_decay=0 reproduces the reference EMA's actual (no-op copy)
        behavior — see the standalone IJEPA trajectory test above."""

        def prepare_batch(self, batch, step, training=True):
            batch = dict(batch)
            batch[ENCODER_MASK_KEY] = enc_masks[min(step, c["steps"] - 1)]
            batch[PREDICTOR_MASK_KEY] = pred_masks[min(step, c["steps"] - 1)]
            return batch

    shared_vit = VisionTransformer(
        img_size=c["img"], patch_size=c["patch"], embed_dim=c["embed_dim"],
        depth=c["depth"], num_heads=c["num_heads"], norm_eps=1e-5,
        use_cls_token=False, global_pool="none",
    )
    predictor = VisionTransformerPredictor(
        num_patches=(c["img"] // c["patch"]) ** 2, embed_dim=c["embed_dim"],
        predictor_embed_dim=c["pred_embed_dim"], depth=c["pred_depth"],
        num_heads=c["num_heads"], norm_eps=1e-5,
    )

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(
                c["emb"],
                kernel_init=lambda *_: jnp.asarray(fx["head_weight"].T),
                bias_init=lambda *_: jnp.asarray(fx["head_bias"]),
            )(x)

    class MultiTask(ContrastivePretraining):
        def init_params(self, rng, sample_batch):
            params = super().init_params(rng, sample_batch)
            enc_key = self.encoder_keys["rgb"]
            fresh = params["encoders"][enc_key]
            loaded = jax.tree.map(jnp.asarray, enc_params)
            assert jax.tree.structure(fresh) == jax.tree.structure(loaded)
            params["encoders"][enc_key] = loaded
            fresh_p = params["aux"]["ijepa_aux"]["predictor"]
            loaded_p = jax.tree.map(jnp.asarray, pred_params)
            assert jax.tree.structure(fresh_p) == jax.tree.structure(loaded_p)
            params["aux"]["ijepa_aux"]["predictor"] = loaded_p
            return params

    task = MultiTask(
        encoders={
            "rgb": shared_vit,
            "text": MLPEncoder(
                w1=fx["txt_fc1.weight"], b1=fx["txt_fc1.bias"],
                w2=fx["txt_fc2.weight"], b2=fx["txt_fc2.bias"],
            ),
        },
        postprocessors={"rgb": lambda x: x.mean(axis=1)},
        heads={"rgb": Head()},
        optimizer=functools.partial(
            optax.adamw, b1=c["betas"][0], b2=c["betas"][1], eps=c["eps"],
            weight_decay=c["weight_decay"],
        ),
        lr_scheduler=functools.partial(
            linear_warmup_cosine_annealing_lr, base_lr=c["lr"],
            warmup_steps=c["warmup_steps"], max_steps=c["steps"],
            start_factor=c["start_factor"], eta_min=c["eta_min"],
        ),
        auxiliary_tasks={
            "ijepa_aux": AuxiliaryTaskSpec(
                modality="rgb",
                task=functools.partial(
                    ReplayAuxIJEPA,
                    predictor=predictor,
                    ema_decay=0.0, ema_decay_end=0.0,
                    ema_anneal_end_step=100,
                ),
                loss_weight=c["aux_weight"],
            )
        },
    )

    batches = [
        {
            "rgb": np.transpose(rgb[i], (0, 2, 3, 1)),  # NCHW → NHWC
            "text": txt[i],
            "example_ids": {"rgb": ids, "text": ids},
        }
        for i in range(c["n_batches"])
    ]
    rec = Recorder()
    trainer = Trainer(
        max_steps=c["steps"], log_every_n_steps=1, callbacks=[rec],
        mesh_shape={"data": 1}, default_root_dir=str(tmp_path), seed=0,
    )
    state = trainer.fit(task, FixedLoader(batches))
    assert int(state.step) == c["steps"]

    ref_losses = fx["losses"]
    got = np.asarray(rec.losses)
    np.testing.assert_allclose(got[0], ref_losses[0], rtol=1e-4)
    np.testing.assert_allclose(got[:10], ref_losses[:10], rtol=1e-3)
    np.testing.assert_allclose(got, ref_losses, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(rec.scales), np.exp(fx["log_scales"]), rtol=5e-3
    )


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


CLIP_FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures",
    "reference_clip_trajectory.npz",
)
CLIP_INIT_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "fixtures",
    "reference_clip_trajectory_init.ckpt",
)

# must match scripts/record_reference_fixtures.py::CLIP_TRAJ
CLIP_TRAJ = dict(
    vocab=99, hidden=32, inter=64, depth=2, heads=4, max_pos=16, eos=98,
    img=32, patch=8, head_out=16,
    batch=16, n_batches=6, steps=30,
    lr=1e-3, betas=(0.9, 0.98), eps=1e-8, weight_decay=0.1,
    warmup_steps=5, start_factor=1.0 / 3.0, eta_min=0.0,
)


def make_clip_trajectory_data():
    """Identical to the recorder's data generation (seeded)."""
    rng = np.random.default_rng(2468)
    c = CLIP_TRAJ
    imgs = rng.standard_normal(
        (c["n_batches"], c["batch"], 3, c["img"], c["img"])
    ).astype(np.float32)
    ids = rng.integers(
        1, 90, (c["n_batches"], c["batch"], 12)
    ).astype(np.int64)
    eos_pos = rng.integers(4, 12, (c["n_batches"], c["batch"]))
    for b in range(c["n_batches"]):
        for r in range(c["batch"]):
            ids[b, r, eos_pos[b, r]:] = c["eos"]
    probe_imgs = imgs[0, :8]
    probe_ids = ids[0, :8]
    ex_ids = np.stack(
        [np.zeros(c["batch"], np.int64), np.arange(c["batch"], dtype=np.int64)],
        axis=1,
    )
    return imgs, ids, probe_imgs, probe_ids, ex_ids


@pytest.mark.integration_test
def test_clip_tower_training_trajectory_matches_reference(tmp_path):
    """REAL-tower contrastive trajectory parity (VERDICT r3 item 3): the
    reference's ContrastivePretraining trained a 2-layer HF CLIP ViT + a
    2-layer causal EOS-pooled text transformer + Linear heads for 30 AdamW
    steps (reference contrastive_pretraining.py:471-505); our towers with
    converted-identical init (via the lightning_import converter — double
    coverage of the migration path) must trace the same losses/logit-scale
    and land on the same probe embeddings."""
    pytest.importorskip("torch")
    from mmlearn_tpu.lightning_import import (
        import_lightning_checkpoint,
        overlay_params,
    )
    from mmlearn_tpu.modules.encoders import TextTransformer, VisionTransformer
    from mmlearn_tpu.modules.layers.mlp import MLP

    fx = np.load(CLIP_FIXTURE)
    c = CLIP_TRAJ
    imgs, ids, probe_imgs, probe_ids, ex_ids = make_clip_trajectory_data()

    overlay, _ = import_lightning_checkpoint(CLIP_INIT_CKPT, num_heads=c["heads"])

    vision = VisionTransformer(
        img_size=c["img"], patch_size=c["patch"], embed_dim=c["hidden"],
        depth=c["depth"], num_heads=c["heads"],
        mlp_ratio=c["inter"] / c["hidden"], qkv_bias=True,
        use_cls_token=True, learned_pos_embed=True, pre_norm=True,
        final_norm=True, act_layer="quick_gelu", norm_eps=1e-5,
        global_pool="cls", patch_embed_bias=False,
    )
    text = TextTransformer(
        vocab_size=c["vocab"], max_length=c["max_pos"],
        embed_dim=c["hidden"], depth=c["depth"], num_heads=c["heads"],
        mlp_ratio=c["inter"] / c["hidden"], qkv_bias=True, causal=True,
        act_layer="quick_gelu", norm_eps=1e-5, pooling="eos",
    )

    class ImportedInit(ContrastivePretraining):
        def init_params(self, rng, sample_batch):
            fresh = super().init_params(rng, sample_batch)
            return overlay_params(fresh, overlay)

    task = ImportedInit(
        encoders={"rgb": vision, "text": text},
        heads={
            "rgb": MLP(out_dim=c["head_out"]),
            "text": MLP(out_dim=c["head_out"]),
        },
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
            "rgb": np.transpose(imgs[i], (0, 2, 3, 1)),
            "text": ids[i].astype(np.int32),
            "example_ids": {"rgb": ex_ids, "text": ex_ids},
        }
        for i in range(c["n_batches"])
    ]
    rec = Recorder()
    trainer = Trainer(
        max_steps=c["steps"], log_every_n_steps=1,
        callbacks=[LearningRateMonitor(), rec],
        mesh_shape={"data": 1}, default_root_dir=str(tmp_path), seed=0,
    )
    state = trainer.fit(task, FixedLoader(batches))
    assert int(state.step) == c["steps"]

    ref_losses = fx["losses"]
    got = np.asarray(rec.losses)
    # step 0 is pre-update: converted init + tower forward at f32 level
    np.testing.assert_allclose(got[0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(got[:10], ref_losses[:10], rtol=3e-4)
    np.testing.assert_allclose(got, ref_losses, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(rec.lrs), fx["lrs"], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rec.scales), np.exp(fx["log_scales"]), rtol=5e-3
    )

    probe = {
        "rgb": jnp.asarray(np.transpose(probe_imgs, (0, 2, 3, 1))),
        "text": jnp.asarray(probe_ids.astype(np.int32)),
    }
    out = task.forward(state.params, probe, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["rgb_embedding"]), fx["final_rgb"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["text_embedding"]), fx["final_text"], atol=2e-3
    )
