"""Tests for layers and encoders (shapes, masking, determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.modules.encoders import (
    TextTransformer,
    VisionTransformer,
    VisionTransformerPredictor,
    apply_masks,
    repeat_interleave_batch,
    vit_tiny,
)
from mmlearn_tpu.modules.layers import MLP, Block, LearnableLogitScaling, PatchDropout
from mmlearn_tpu.modules.layers.embedding import get_2d_sincos_pos_embed


def test_mlp_hidden_dims():
    m = MLP(hidden_dims=[8, 8], out_dim=4)
    params = m.init(jax.random.key(0), jnp.ones((2, 6)))
    out = m.apply(params, jnp.ones((2, 6)))
    assert out.shape == (2, 4)
    names = set(params["params"].keys())
    assert names == {"fc1", "fc2", "fc3"}


def test_mlp_multiplier():
    m = MLP(hidden_dims_multiplier=[2.0])
    params = m.init(jax.random.key(0), jnp.ones((2, 6)))
    assert params["params"]["fc1"]["kernel"].shape == (6, 12)
    assert params["params"]["fc2"]["kernel"].shape == (12, 6)


def test_block_forward():
    blk = Block(dim=32, num_heads=4)
    x = jnp.ones((2, 10, 32))
    params = blk.init(jax.random.key(0), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape


def test_sincos_pos_embed_shape():
    emb = get_2d_sincos_pos_embed(64, 4, cls_token=True)
    assert emb.shape == (17, 64)
    np.testing.assert_array_equal(emb[0], 0)


def test_vit_forward():
    model = vit_tiny(img_size=32, patch_size=8)
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out[0].shape == (2, 16, 192)


def test_vit_cls_and_pool():
    model = VisionTransformer(
        img_size=32,
        patch_size=8,
        embed_dim=48,
        depth=2,
        num_heads=4,
        use_cls_token=True,
        learned_pos_embed=True,
        global_pool="cls",
        proj_dim=24,
    )
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.last_hidden_state.shape == (2, 17, 48)
    assert out.pooler_output.shape == (2, 24)


def test_vit_patch_masks():
    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=48, depth=1, num_heads=4
    )
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    masks = jnp.tile(jnp.arange(6)[None, None], (1, 2, 1))  # (1, B, 6)
    out = model.apply(params, x, patch_masks=masks)
    assert out[0].shape == (2, 6, 48)


def test_apply_masks_and_repeat():
    x = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    masks = jnp.asarray([[[0, 2], [1, 3]], [[1, 1], [0, 0]]])  # (2 masks, B=2, K=2)
    out = apply_masks(x, masks)
    assert out.shape == (4, 2, 3)
    np.testing.assert_array_equal(out[0], x[0, [0, 2]])
    np.testing.assert_array_equal(out[1], x[1, [1, 3]])
    np.testing.assert_array_equal(out[2], x[0, [1, 1]])

    rep = repeat_interleave_batch(jnp.asarray([1.0, 2.0, 3.0, 4.0]), b=2, repeat=2)
    np.testing.assert_array_equal(rep, [1, 2, 1, 2, 3, 4, 3, 4])


def test_predictor_shapes():
    pred = VisionTransformerPredictor(
        num_patches=16, embed_dim=48, predictor_embed_dim=32, depth=1, num_heads=4
    )
    b, k_ctx, k_tgt = 2, 6, 3
    z = jnp.ones((b, k_ctx, 48))
    enc_masks = jnp.tile(jnp.arange(k_ctx)[None, None], (1, b, 1))
    pred_masks = jnp.tile(jnp.arange(k_tgt)[None, None], (4, b, 1))
    params = pred.init(jax.random.key(0), z, enc_masks, pred_masks)
    out = pred.apply(params, z, enc_masks, pred_masks)
    assert out.shape == (4 * b, k_tgt, 48)


def test_text_transformer_pooling():
    model = TextTransformer(
        vocab_size=100, max_length=16, embed_dim=32, depth=2, num_heads=4,
        causal=True, pooling="eos", proj_dim=24,
    )
    ids = jnp.asarray([[5, 7, 99, 0], [3, 99, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]])
    params = model.init(jax.random.key(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.last_hidden_state.shape == (2, 4, 32)
    assert out.pooler_output.shape == (2, 24)


def test_text_padding_mask_invariance():
    """Padding tokens must not change non-pad outputs (flash-attn mask path)."""
    model = TextTransformer(
        vocab_size=50, max_length=8, embed_dim=32, depth=1, num_heads=4,
        causal=False, pooling="mean",
    )
    ids_a = jnp.asarray([[5, 7, 9, 1, 1, 1, 1, 1]])
    ids_b = jnp.asarray([[5, 7, 9, 2, 3, 4, 2, 3]])
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0, 0, 0]])
    params = model.init(jax.random.key(0), ids_a, mask)
    out_a = model.apply(params, ids_a, mask).last_hidden_state[:, :3]
    out_b = model.apply(params, ids_b, mask).last_hidden_state[:, :3]
    np.testing.assert_allclose(out_a, out_b, atol=1e-5)


def test_patch_dropout():
    pd = PatchDropout(keep_rate=0.5, num_prefix_tokens=1)
    x = jnp.ones((2, 9, 4))
    out = pd.apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.key(0)}
    )
    assert out.shape == (2, 5, 4)  # 1 prefix + 4 kept
    out_det = pd.apply({}, x, deterministic=True)
    assert out_det.shape == x.shape


def test_logit_scaling():
    ls = LearnableLogitScaling(logit_scale_init=10.0, max_logit_scale=5.0)
    params = ls.init(jax.random.key(0), jnp.ones((2,)))
    out = ls.apply(params, jnp.ones((2,)))
    np.testing.assert_allclose(out, 5.0, rtol=1e-6)  # clamped


def test_ema():
    from mmlearn_tpu.modules import ExponentialMovingAverage

    ema = ExponentialMovingAverage(ema_decay=0.5, ema_end_decay=1.0,
                                   ema_anneal_end_step=10)
    params = {"w": jnp.asarray(0.0), "skip/me": jnp.asarray(0.0)}
    teacher = ema.init({"w": jnp.asarray(1.0), "skip/me": jnp.asarray(1.0)})
    out = ema.step(teacher, params, num_updates=0)
    np.testing.assert_allclose(out["w"], 0.5)
    # annealing: at step 10, decay = 1.0 → teacher unchanged
    out2 = ema.step(teacher, params, num_updates=10)
    np.testing.assert_allclose(out2["w"], 1.0)

    ema_skip = ExponentialMovingAverage(ema_decay=0.5, skip_keys=("skip",))
    out3 = ema_skip.step(teacher, params, num_updates=0)
    np.testing.assert_allclose(out3["skip/me"], 0.0)  # copied, not averaged


def test_causal_tower_padding_mask_is_a_noop_for_valid_positions():
    """On a causal tower, padding sits after EOS and cannot influence any
    earlier position: eliding the key-validity mask must leave the pooled
    output and every non-pad hidden state unchanged."""
    import numpy as np

    from mmlearn_tpu.modules.encoders import TextTransformer

    kw = dict(vocab_size=50, max_length=12, embed_dim=32, depth=2,
              num_heads=4, causal=True, pooling="eos")
    masked = TextTransformer(**kw)
    elided = TextTransformer(elide_padding_mask=True, **kw)

    rng = np.random.default_rng(0)
    b, n = 4, 12
    lengths = np.array([12, 7, 3, 9])
    ids = rng.integers(2, 48, (b, n)).astype(np.int32)
    mask = np.zeros((b, n), np.int32)
    for i, l in enumerate(lengths):
        ids[i, l - 1] = 49  # eos = max token id (argmax pooling)
        ids[i, l:] = 0  # padding
        mask[i, :l] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    params = masked.init(jax.random.key(0), ids, mask)
    out_m = masked.apply(params, ids, mask)
    out_e = elided.apply(params, ids, mask)

    np.testing.assert_allclose(
        np.asarray(out_m.pooler_output), np.asarray(out_e.pooler_output),
        atol=1e-5,
    )
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out_m.last_hidden_state[i, :l]),
            np.asarray(out_e.last_hidden_state[i, :l]),
            atol=1e-5,
        )
