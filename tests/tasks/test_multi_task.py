"""Multi-task composition test: contrastive + auxiliary I-JEPA on shared encoder.

Covers the reference's multi_task project pattern
(/root/reference/projects/multi_task/configs/experiment/contrastive_ijepa.yaml):
one encoder participates in the contrastive loss AND is the student of a
nested I-JEPA task with its own EMA teacher.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY
from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader, Example
from mmlearn_tpu.modules.encoders import VisionTransformer
from mmlearn_tpu.tasks import AuxiliaryTaskSpec, ContrastivePretraining, IJEPA
from mmlearn_tpu.trainer import Trainer

from tests.tasks.test_end_to_end import LossRecorder


class RGBDepthDataset:
    def __init__(self, size=48, img=32, classes=6, seed=0):
        rng = np.random.default_rng(seed)
        self.size, self.img = size, img
        self.labels = rng.integers(0, classes, size)
        self.rgb_patterns = rng.standard_normal((classes, img, img, 3)).astype(
            np.float32
        )
        self.depth_patterns = rng.standard_normal((classes, img, img, 1)).astype(
            np.float32
        )

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        k = self.labels[idx]
        return Example(
            {
                "rgb": self.rgb_patterns[k],
                "depth": self.depth_patterns[k],
                EXAMPLE_INDEX_KEY: idx,
            }
        )


@pytest.mark.integration_test
def test_contrastive_with_aux_ijepa():
    ds = CombinedDataset([RGBDepthDataset()])
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)

    encoders = {
        "rgb": VisionTransformer(
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
            global_pool="avg", proj_dim=16,
        ),
        "depth": VisionTransformer(
            img_size=32, patch_size=8, in_chans=1, embed_dim=32, depth=1,
            num_heads=4, global_pool="avg", proj_dim=16,
        ),
    }
    task = ContrastivePretraining(
        encoders=encoders,
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3,
                                    weight_decay=0.0),
        auxiliary_tasks={
            "ijepa_rgb": AuxiliaryTaskSpec(
                modality="rgb",
                loss_weight=0.5,
                task=functools.partial(
                    IJEPA, ema_decay=0.9, ema_anneal_end_step=100
                ),
            )
        },
        log_auxiliary_tasks_loss=True,
    )
    rec = LossRecorder()
    trainer = Trainer(max_steps=8, log_every_n_steps=1, callbacks=[rec],
                      seed=0, default_root_dir="/tmp/mmlearn_test_mt")
    state = trainer.fit(task, loader)

    assert int(state.step) == 8
    assert np.isfinite(rec.losses).all()
    # aux param tree exists (predictor) and EMA teacher lives in extras
    assert "predictor" in state.params["aux"]["ijepa_rgb"]
    ema = state.extras["ijepa_rgb"]["ema_encoder"]
    student = state.params["encoders"]["rgb"]
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), ema, student)
    assert max(jax.tree.leaves(diffs)) > 0


@pytest.mark.integration_test
def test_modality_module_mapping_shares_encoder():
    """Two modalities sharing one encoder via ModuleKeySpec train together."""
    from mmlearn_tpu.tasks import ModuleKeySpec

    ds = CombinedDataset([RGBDepthDataset(size=32)])
    loader = DataLoader(ds, batch_size=8, drop_last=True)

    # depth is 1-channel; tile to 3 channels so one encoder serves both
    class TiledDepth(RGBDepthDataset):
        def __getitem__(self, idx):
            ex = super().__getitem__(idx)
            ex["depth"] = np.tile(ex["depth"], (1, 1, 3))
            return ex

    ds = CombinedDataset([TiledDepth(size=32)])
    loader = DataLoader(ds, batch_size=8, drop_last=True)
    shared = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=4,
        global_pool="avg", proj_dim=16,
    )
    task = ContrastivePretraining(
        encoders={"rgb": shared, "depth": shared},
        modality_module_mapping={
            "rgb": ModuleKeySpec(encoder_key="shared"),
            "depth": ModuleKeySpec(encoder_key="shared"),
        },
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3),
    )
    trainer = Trainer(max_steps=3, log_every_n_steps=1, seed=0,
                      default_root_dir="/tmp/mmlearn_test_shared")
    state = trainer.fit(task, loader)
    # exactly ONE encoder param subtree
    assert list(state.params["encoders"].keys()) == ["shared"]
    emb = task.forward(state.params, next(iter(loader)))
    assert "rgb_embedding" in emb and "depth_embedding" in emb


@pytest.mark.integration_test
def test_heads_and_postprocessors_compose():
    """encode() = encoder → postprocessor → head → L2 norm (reference
    contrastive_pretraining.py:400-431) with flax-module heads and a
    callable postprocessor."""
    from mmlearn_tpu.modules.layers import MLP

    class CLSPooler:
        def __call__(self, x):
            return x[:, 0]

    ds = CombinedDataset([RGBDepthDataset(size=16)])
    loader = DataLoader(ds, batch_size=8, drop_last=True)
    encoders = {
        "rgb": VisionTransformer(
            img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=4,
            use_cls_token=True, global_pool="none",
        ),
        "depth": VisionTransformer(
            img_size=32, patch_size=8, in_chans=1, embed_dim=32, depth=1,
            num_heads=4, use_cls_token=True, global_pool="none",
        ),
    }
    task = ContrastivePretraining(
        encoders=encoders,
        postprocessors={"rgb": CLSPooler(), "depth": CLSPooler()},
        heads={
            "rgb": MLP(hidden_dims=[24], out_dim=16),
            "depth": MLP(hidden_dims=[24], out_dim=16),
        },
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3),
    )
    trainer = Trainer(max_steps=3, log_every_n_steps=1, seed=0,
                      default_root_dir="/tmp/mmlearn_test_heads")
    state = trainer.fit(task, loader)
    assert "rgb" in state.params["heads"]
    emb = task.forward(state.params, next(iter(loader)))
    assert emb["rgb_embedding"].shape == (8, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb["rgb_embedding"]), axis=-1), 1.0,
        rtol=1e-5,
    )
