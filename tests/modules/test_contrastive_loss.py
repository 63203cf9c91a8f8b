"""Tests for the masked contrastive loss, incl. multi-device parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.modules.losses import ContrastiveLoss, LossPairSpec, masked_infonce


def _embeddings(rng, b=16, d=8):
    za = rng.standard_normal((b, d)).astype(np.float32)
    zb = rng.standard_normal((b, d)).astype(np.float32)
    za /= np.linalg.norm(za, axis=-1, keepdims=True)
    zb /= np.linalg.norm(zb, axis=-1, keepdims=True)
    return jnp.asarray(za), jnp.asarray(zb)


def _reference_infonce(za, zb, scale):
    """Plain (unmasked) numpy InfoNCE for cross-checking."""
    logits = scale * np.asarray(za) @ np.asarray(zb).T
    def ce(lg):
        lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + lg.max(-1)
        return (lse - np.diagonal(lg)).mean()
    return 0.5 * (ce(logits) + ce(logits.T))


def test_masked_infonce_matches_reference(rng):
    za, zb = _embeddings(rng)
    scale = 10.0
    loss_fn = ContrastiveLoss()
    pairs = [LossPairSpec(("rgb", "text"))]
    loss, metrics = loss_fn(
        {"rgb": za, "text": zb}, None, jnp.asarray(scale), pairs
    )
    expected = _reference_infonce(za, zb, scale)
    np.testing.assert_allclose(loss, expected, rtol=1e-5)
    assert "loss_rgb_text" in metrics


def test_masked_rows_equal_subset_loss(rng):
    """Loss over a masked batch == loss over the dense subset batch."""
    za, zb = _embeddings(rng, b=12)
    valid = np.zeros(12, dtype=bool)
    valid[:8] = True
    loss_fn = ContrastiveLoss()
    pairs = [LossPairSpec(("rgb", "text"))]
    loss_masked, _ = loss_fn(
        {"rgb": za, "text": zb},
        None,
        jnp.asarray(5.0),
        pairs,
        presence={"rgb": jnp.asarray(valid), "text": jnp.ones(12, bool)},
    )
    loss_subset, _ = loss_fn(
        {"rgb": za[:8], "text": zb[:8]}, None, jnp.asarray(5.0), pairs
    )
    np.testing.assert_allclose(loss_masked, loss_subset, rtol=1e-5)


def test_example_ids_sentinel_masks(rng):
    za, zb = _embeddings(rng, b=6)
    ids = np.tile(np.arange(6)[:, None], (1, 2)).astype(np.int64)
    ids_b = ids.copy()
    ids_b[4:] = -1  # absent
    loss_fn = ContrastiveLoss()
    pairs = [LossPairSpec(("rgb", "text"))]
    loss, _ = loss_fn(
        {"rgb": za, "text": zb},
        {"rgb": jnp.asarray(ids), "text": jnp.asarray(ids_b)},
        jnp.asarray(5.0),
        pairs,
    )
    loss_subset, _ = loss_fn(
        {"rgb": za[:4], "text": zb[:4]}, None, jnp.asarray(5.0), pairs
    )
    np.testing.assert_allclose(loss, loss_subset, rtol=1e-5)


def test_multi_pair_weights(rng):
    za, zb = _embeddings(rng, b=8)
    zc = za[::-1]
    loss_fn = ContrastiveLoss()
    loss_two, _ = loss_fn(
        {"rgb": za, "text": zb, "audio": zc},
        None,
        jnp.asarray(3.0),
        [LossPairSpec(("rgb", "text"), weight=2.0),
         LossPairSpec(("rgb", "audio"), weight=0.5)],
    )
    l1, _ = loss_fn({"rgb": za, "text": zb}, None, jnp.asarray(3.0),
                    [LossPairSpec(("rgb", "text"))])
    l2, _ = loss_fn({"rgb": za, "audio": zc}, None, jnp.asarray(3.0),
                    [LossPairSpec(("rgb", "audio"))])
    np.testing.assert_allclose(loss_two, 2.0 * l1 + 0.5 * l2, rtol=1e-5)


def test_modality_alignment_runs(rng):
    za, zb = _embeddings(rng, b=8)
    loss_fn = ContrastiveLoss(modality_alignment=True)
    ids = jnp.tile(jnp.arange(8)[:, None], (1, 2))
    loss, metrics = loss_fn(
        {"rgb": za, "text": zb},
        {"rgb": ids, "text": ids},
        jnp.asarray(2.0),
        [LossPairSpec(("rgb", "text"))],
    )
    assert "loss_alignment" in metrics
    assert np.isfinite(float(loss))


def test_sharded_loss_matches_single_device(rng):
    """Loss under jit with a data-sharded batch == single-device loss.

    This is the GSPMD replacement for the reference's gather-with-grad
    collectives: XLA inserts the all-gather; numbers must not change.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmlearn_tpu.parallel import create_mesh

    za, zb = _embeddings(rng, b=16)
    mesh = create_mesh(data=8)
    pairs = [LossPairSpec(("rgb", "text"))]
    loss_fn = ContrastiveLoss()

    def compute(a, b):
        loss, _ = loss_fn({"rgb": a, "text": b}, None, jnp.asarray(7.0), pairs)
        return loss

    single = compute(za, zb)
    sharding = NamedSharding(mesh, P(("data", "fsdp")))
    za_s = jax.device_put(za, sharding)
    zb_s = jax.device_put(zb, sharding)
    sharded = jax.jit(compute)(za_s, zb_s)
    np.testing.assert_allclose(sharded, single, rtol=1e-5)


def test_sharded_loss_gradients_match(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmlearn_tpu.parallel import create_mesh

    za, zb = _embeddings(rng, b=16)
    mesh = create_mesh(data=8)
    pairs = [LossPairSpec(("rgb", "text"))]
    loss_fn = ContrastiveLoss(l2_normalize=True)

    def compute(a, b):
        return loss_fn({"rgb": a, "text": b}, None, jnp.asarray(7.0), pairs)[0]

    g_single = jax.grad(compute)(za, zb)
    sharding = NamedSharding(mesh, P(("data", "fsdp")))
    g_sharded = jax.jit(jax.grad(compute))(
        jax.device_put(za, sharding), jax.device_put(zb, sharding)
    )
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), atol=1e-6
    )


def test_chunked_matches_dense(rng):
    from mmlearn_tpu.modules.losses.contrastive import masked_infonce_chunked

    za, zb = _embeddings(rng, b=20)
    valid = np.ones(20, dtype=bool)
    valid[17:] = False
    import jax.numpy as jnp

    dense_logits = 9.0 * np.asarray(za) @ np.asarray(zb).T
    dense = masked_infonce(jnp.asarray(dense_logits), jnp.asarray(valid))
    chunked = masked_infonce_chunked(
        za, zb, jnp.asarray(9.0), jnp.asarray(valid), chunk_size=7
    )
    np.testing.assert_allclose(chunked, dense, rtol=1e-5)


def test_chunked_loss_flag_and_grads(rng):
    import jax
    import jax.numpy as jnp

    za, zb = _embeddings(rng, b=16)
    pairs = [LossPairSpec(("rgb", "text"))]

    def loss_with(flag):
        fn = ContrastiveLoss(chunked=flag, chunk_size=5)
        def f(a, b):
            return fn({"rgb": a, "text": b}, None, jnp.asarray(4.0), pairs)[0]
        return f

    dense_val = loss_with(False)(za, zb)
    chunk_val = jax.jit(loss_with(True))(za, zb)
    np.testing.assert_allclose(chunk_val, dense_val, rtol=1e-5)
    g_dense = jax.grad(loss_with(False))(za, zb)
    g_chunk = jax.jit(jax.grad(loss_with(True)))(za, zb)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_dense),
                               atol=1e-5)
