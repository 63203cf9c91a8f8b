"""End-to-end training smoke tests on the 8-device CPU mesh.

These are the JAX analogue of "Phase 1/2" in SURVEY.md §7: CLI-less vertical
cut through task → model → data → jitted SPMD train loop; loss must decrease.
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader, Example
from mmlearn_tpu.modules.encoders import TextTransformer, VisionTransformer
from mmlearn_tpu.modules.lr_schedulers import linear_warmup_cosine_annealing_lr
from mmlearn_tpu.tasks import ContrastivePretraining, IJEPA
from mmlearn_tpu.trainer import Trainer

import optax


class PairedDataset:
    """Synthetic correlated image/text pairs: class k → image pattern k, token k."""

    def __init__(self, size=64, img=16, classes=8, seed=0):
        rng = np.random.default_rng(seed)
        self.size, self.img, self.classes = size, img, classes
        self.labels = rng.integers(0, classes, size)
        self.patterns = rng.standard_normal((classes, img, img, 3)).astype(np.float32)

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        k = self.labels[idx]
        img = self.patterns[k] + 0.05 * np.random.default_rng(idx).standard_normal(
            (self.img, self.img, 3)
        ).astype(np.float32)
        ids = np.full((8,), k + 2, dtype=np.int32)
        ids[0] = 1  # bos
        ids[-1] = 30  # eot (max id → eos pooling picks it)
        return Example(
            {
                "rgb": img,
                "text": ids,
                "text_attention_mask": np.ones(8, np.int32),
                EXAMPLE_INDEX_KEY: idx,
            }
        )


def _tiny_task(**kwargs):
    encoders = {
        "rgb": VisionTransformer(
            img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
            use_cls_token=True, global_pool="cls", proj_dim=16,
        ),
        "text": TextTransformer(
            vocab_size=32, max_length=8, embed_dim=32, depth=2, num_heads=4,
            causal=True, pooling="eos", proj_dim=16,
        ),
    }
    return ContrastivePretraining(
        encoders=encoders,
        optimizer=functools.partial(optax.adamw, weight_decay=0.01),
        lr_scheduler=functools.partial(
            linear_warmup_cosine_annealing_lr, base_lr=3e-3, warmup_steps=5
        ),
        **kwargs,
    )


class LossRecorder:
    def __init__(self):
        self.losses = []

    def on_train_start(self, trainer): ...
    def on_train_batch_end(self, trainer, metrics, step):
        if "loss" in metrics:
            self.losses.append(metrics["loss"])
    def on_train_epoch_end(self, trainer, epoch): ...
    def on_validation_end(self, trainer, metrics, step): ...
    def on_train_end(self, trainer): ...


@pytest.mark.integration_test
def test_contrastive_training_loss_decreases():
    ds = CombinedDataset([PairedDataset()])
    loader = DataLoader(ds, batch_size=16, shuffle=True, drop_last=True)
    task = _tiny_task()
    rec = LossRecorder()
    trainer = Trainer(
        max_steps=30, log_every_n_steps=1, callbacks=[rec], seed=0,
        default_root_dir="/tmp/mmlearn_test_contrastive",
    )
    state = trainer.fit(task, loader)
    assert int(state.step) == 30
    first = np.mean(rec.losses[:5])
    last = np.mean(rec.losses[-5:])
    assert last < first * 0.9, f"loss did not decrease: {first} -> {last}"


@pytest.mark.integration_test
def test_contrastive_training_sharded_matches_replicated():
    """1-device mesh vs 8-device data-parallel mesh give identical losses."""
    ds = CombinedDataset([PairedDataset(size=32)])

    def run(mesh_shape):
        import jax

        loader = DataLoader(ds, batch_size=16, drop_last=True)
        task = _tiny_task()
        rec = LossRecorder()
        trainer = Trainer(
            max_steps=4, log_every_n_steps=1, callbacks=[rec], seed=0,
            mesh_shape=mesh_shape,
            default_root_dir="/tmp/mmlearn_test_dp",
        )
        trainer.fit(task, loader)
        return rec.losses

    import jax

    losses_1 = run({"data": 1, "fsdp": 1, "model": 1})
    losses_8 = run({"data": 8, "fsdp": 1, "model": 1})
    np.testing.assert_allclose(losses_1, losses_8, rtol=2e-3)


@pytest.mark.integration_test
def test_contrastive_training_fsdp_tp_mesh():
    """fsdp+model-parallel mesh compiles and trains."""
    ds = CombinedDataset([PairedDataset(size=32)])
    loader = DataLoader(ds, batch_size=16, drop_last=True)
    task = _tiny_task()
    rec = LossRecorder()
    trainer = Trainer(
        max_steps=3, log_every_n_steps=1, callbacks=[rec], seed=0,
        mesh_shape={"data": 2, "fsdp": 2, "model": 2},
        default_root_dir="/tmp/mmlearn_test_tp",
    )
    state = trainer.fit(task, loader)
    assert int(state.step) == 3
    assert np.isfinite(rec.losses).all()


class ImageOnlyDataset:
    def __init__(self, size=32, img=32):
        self.size, self.img = size, img

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        rng = np.random.default_rng(idx)
        return Example(
            {
                "rgb": rng.standard_normal((self.img, self.img, 3)).astype(np.float32),
                EXAMPLE_INDEX_KEY: idx,
            }
        )


@pytest.mark.integration_test
def test_ijepa_training_runs_and_ema_moves():
    import jax

    ds = CombinedDataset([ImageOnlyDataset()])
    loader = DataLoader(ds, batch_size=8, drop_last=True)
    encoder = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4
    )
    task = IJEPA(
        encoder=encoder,
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3),
        ema_decay=0.9, ema_decay_end=0.99, ema_anneal_end_step=100,
    )
    rec = LossRecorder()
    trainer = Trainer(
        max_steps=6, log_every_n_steps=1, callbacks=[rec], seed=0,
        default_root_dir="/tmp/mmlearn_test_ijepa",
    )
    state = trainer.fit(task, loader)
    assert np.isfinite(rec.losses).all()
    # EMA teacher must differ from both its init and the student
    ema = state.extras["ema_encoder"]
    student = state.params["encoder"]
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), ema, student
    )
    assert max(jax.tree.leaves(diffs)) > 0


@pytest.mark.integration_test
def test_contrastive_training_seq_parallel_mesh():
    """End-to-end training on a data x seq x model mesh: the towers route
    attention through the ppermute ring (ops/ring_attention.py) and the loss
    matches the 1-device run."""
    ds = CombinedDataset([PairedDataset(size=32)])

    def run(mesh_shape):
        loader = DataLoader(ds, batch_size=16, drop_last=True)
        # no CLS token so the vision sequence (4 patches) divides the ring
        encoders = {
            "rgb": VisionTransformer(
                img_size=16, patch_size=8, embed_dim=32, depth=2,
                num_heads=4, use_cls_token=False, global_pool="avg",
                proj_dim=16,
            ),
            "text": TextTransformer(
                vocab_size=32, max_length=8, embed_dim=32, depth=2,
                num_heads=4, causal=True, pooling="eos", proj_dim=16,
            ),
        }
        task = ContrastivePretraining(
            encoders=encoders,
            optimizer=functools.partial(
                optax.adamw, learning_rate=3e-3, weight_decay=0.01
            ),
        )
        rec = LossRecorder()
        trainer = Trainer(
            max_steps=3, log_every_n_steps=1, callbacks=[rec], seed=0,
            mesh_shape=mesh_shape,
            default_root_dir="/tmp/mmlearn_test_seq",
        )
        state = trainer.fit(task, loader)
        assert int(state.step) == 3
        return rec.losses

    plain = run({"data": 1, "fsdp": 1, "model": 1})
    ring = run({"data": 2, "fsdp": 1, "seq": 2, "model": 2})
    assert np.isfinite(ring).all()
    np.testing.assert_allclose(plain, ring, rtol=5e-3)


@pytest.mark.integration_test
def test_contrastive_training_hybrid_slice_mesh_matches_replicated():
    """2-slice hybrid (DCN-emulated) mesh: create_mesh(slices=2) lays the
    data axis out slice-major; training losses must match the 1-device run
    exactly as for the flat data-parallel mesh (partitioning rules are
    unchanged — VERDICT r2 item 4)."""
    from mmlearn_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, fsdp=2, model=1, slices=2)
    assert mesh.axis_names == ("data", "fsdp", "model")
    assert mesh.shape["data"] == 4

    ds = CombinedDataset([PairedDataset(size=32)])

    def run(mesh_shape):
        loader = DataLoader(ds, batch_size=16, drop_last=True)
        task = _tiny_task()
        rec = LossRecorder()
        trainer = Trainer(
            max_steps=4, log_every_n_steps=1, callbacks=[rec], seed=0,
            mesh_shape=mesh_shape,
            default_root_dir="/tmp/mmlearn_test_slices",
        )
        trainer.fit(task, loader)
        return rec.losses

    losses_1 = run({"data": 1, "fsdp": 1, "model": 1})
    losses_hybrid = run({"data": 4, "fsdp": 2, "model": 1, "slices": 2})
    np.testing.assert_allclose(losses_1, losses_hybrid, rtol=2e-3)


def test_create_mesh_slices_validation():
    from mmlearn_tpu.parallel.mesh import create_mesh

    with pytest.raises(ValueError, match="divisible by slices"):
        create_mesh(data=3, slices=2)


def test_shared_encoder_key_module_sharing():
    """Reference-legal module sharing (reference contrastive_pretraining.py:
    231-260): `encoders` may be keyed by a shared non-modality key that
    modalities reference via modality_module_mapping[..].encoder_key; and a
    modality that shares another modality's key must not overwrite that
    key's module."""
    import jax

    from tests.tasks.test_training_trajectory import MLPEncoder

    rng = np.random.default_rng(0)
    enc = MLPEncoder(
        w1=rng.standard_normal((8, 6)).astype(np.float32),
        b1=np.zeros(8, np.float32),
        w2=rng.standard_normal((4, 8)).astype(np.float32),
        b2=np.zeros(4, np.float32),
    )
    task = ContrastivePretraining(
        encoders={"shared_enc": enc},
        modality_module_mapping={
            "rgb": {"encoder_key": "shared_enc"},
            "text": {"encoder_key": "shared_enc"},
        },
        optimizer=functools.partial(optax.adamw, weight_decay=0.0),
    )
    assert sorted(task.modalities) == ["rgb", "text"]
    batch = {
        "rgb": rng.standard_normal((4, 6)).astype(np.float32),
        "text": rng.standard_normal((4, 6)).astype(np.float32),
    }
    params = task.init_params(jax.random.key(0), batch)
    assert set(params["encoders"]) == {"shared_enc"}
    out = task.forward(params, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["rgb_embedding"]).shape, (4, 4)
    )

    # modality sharing another modality's key: both use rgb's module; the
    # text module (unreferenced) must NOT overwrite it
    e_rgb = enc
    e_text = MLPEncoder(
        w1=rng.standard_normal((8, 6)).astype(np.float32),
        b1=np.ones(8, np.float32),
        w2=rng.standard_normal((4, 8)).astype(np.float32),
        b2=np.ones(4, np.float32),
    )
    task2 = ContrastivePretraining(
        encoders={"rgb": e_rgb, "text": e_text},
        modality_module_mapping={"text": {"encoder_key": "rgb"}},
        optimizer=functools.partial(optax.adamw, weight_decay=0.0),
    )
    params2 = task2.init_params(jax.random.key(0), batch)
    out2 = task2.forward(params2, batch, deterministic=True)
    same = {"rgb": batch["rgb"], "text": batch["rgb"]}
    out_same = task2.forward(params2, same, deterministic=True)
    # identical inputs through the shared encoder give identical embeddings
    np.testing.assert_allclose(
        np.asarray(out_same["rgb_embedding"]),
        np.asarray(out_same["text_embedding"]),
        atol=1e-6,
    )

    # unknown non-modality key with nothing mapping to it still raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Unknown modality"):
        ContrastivePretraining(
            encoders={"mystery": enc},
            optimizer=functools.partial(optax.adamw, weight_decay=0.0),
        )
