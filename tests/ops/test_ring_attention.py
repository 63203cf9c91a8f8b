"""Ring attention over the seq mesh axis vs full-attention reference.

Runs on the 8-device virtual CPU mesh; the ppermute ring and online-softmax
accumulation under test are identical on TPU ICI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.ops.ring_attention import sequence_sharded_attention
from mmlearn_tpu.parallel.mesh import create_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def _qkv(b, h, n, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    return mk(), mk(), mk()


def _full_attention(q, k, v, causal=False):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d**-0.5)
    if causal:
        n = s.shape[-1]
        s = jnp.where(jnp.tril(jnp.ones((n, n), bool)), s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full_attention(causal):
    b, h, n, d = 2, 4, 64, 16
    q, k, v = _qkv(b, h, n, d)
    want = np.asarray(_full_attention(q, k, v, causal=causal))

    mesh = create_mesh(data=1, fsdp=1, seq=8, model=1)
    got = sequence_sharded_attention(q, k, v, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_ring_composes_with_data_and_model_axes():
    b, h, n, d = 4, 4, 32, 16
    q, k, v = _qkv(b, h, n, d, seed=1)
    want = np.asarray(_full_attention(q, k, v, causal=True))

    mesh = create_mesh(data=2, fsdp=1, seq=2, model=2)
    got = sequence_sharded_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_gradients_match_full_attention(causal):
    b, h, n, d = 2, 2, 32, 16
    q, k, v = _qkv(b, h, n, d, seed=2)
    mesh = create_mesh(data=1, fsdp=1, seq=8, model=1)

    def ring_loss(q, k, v):
        out = sequence_sharded_attention(q, k, v, mesh, causal=causal)
        return jnp.sum(out * jnp.cos(out))

    def full_loss(q, k, v):
        out = _full_attention(q, k, v, causal=causal)
        return jnp.sum(out * jnp.cos(out))

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(full_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_full):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-4
        )


def test_ring_bf16_inputs():
    b, h, n, d = 2, 2, 64, 16
    q, k, v = _qkv(b, h, n, d, seed=3)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = np.asarray(
        _full_attention(qb, kb, vb, causal=True), dtype=np.float32
    )
    mesh = create_mesh(data=1, fsdp=1, seq=4, model=1)
    got = sequence_sharded_attention(qb, kb, vb, mesh, causal=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), want, atol=3e-2
    )


def test_rejects_indivisible_sequence():
    mesh = create_mesh(data=1, fsdp=1, seq=8, model=1)
    q, k, v = _qkv(1, 1, 30, 16)
    with pytest.raises(ValueError, match="not divisible"):
        sequence_sharded_attention(q, k, v, mesh)


def test_seq_mesh_keeps_three_axis_default():
    assert create_mesh(data=8).axis_names == ("data", "fsdp", "model")
    m = create_mesh(data=2, seq=4)
    assert m.axis_names == ("data", "fsdp", "seq", "model")
    assert m.shape["seq"] == 4


def test_ring_flash_block_backend_matches_full_attention(monkeypatch):
    """Force the Pallas flash block backend (interpret mode) inside the ring
    and check fwd + grads against full attention — validates that passing
    the merged global (out, lse) into the flash bwd kernels per hop yields
    the exact full-softmax gradients. Uses the shipping env switch
    (MMLEARN_RING_FLASH_INTERPRET), so the exact dispatch a pod run takes
    through _flash_block_mode is what runs here."""
    monkeypatch.setenv("MMLEARN_RING_FLASH_INTERPRET", "1")

    b, h, n, d = 2, 2, 64, 16
    q, k, v = _qkv(b, h, n, d, seed=3)
    mesh = create_mesh(data=1, fsdp=1, seq=4, model=1)

    def ring_loss(q, k, v):
        out = sequence_sharded_attention(q, k, v, mesh, causal=False)
        return jnp.sum(out * jnp.cos(out))

    def full_loss(q, k, v):
        out = _full_attention(q, k, v, causal=False)
        return jnp.sum(out * jnp.cos(out))

    got = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(full_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(
        float(ring_loss(q, k, v)), float(full_loss(q, k, v)), rtol=1e-5
    )
    for g1, g2 in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), atol=3e-5
        )


def test_ring_flash_and_xla_block_backends_agree_at_bf16(monkeypatch):
    """The flash block backend now emits f32 per-hop partials (out_dtype),
    so both backends merge at identical precision — bf16 inputs must give
    near-identical outputs regardless of backend or ring size."""
    b, h, n, d = 2, 2, 128, 16
    q, k, v = _qkv(b, h, n, d, seed=5)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    mesh = create_mesh(data=1, fsdp=1, seq=8, model=1)

    monkeypatch.delenv("MMLEARN_RING_FLASH_INTERPRET", raising=False)
    xla_out = np.asarray(
        sequence_sharded_attention(qb, kb, vb, mesh, causal=False),
        dtype=np.float32,
    )
    monkeypatch.setenv("MMLEARN_RING_FLASH_INTERPRET", "1")
    flash_out = np.asarray(
        sequence_sharded_attention(qb, kb, vb, mesh, causal=False),
        dtype=np.float32,
    )
    # only the score matmul differs (kernel vs einsum rounding); the merge
    # path is f32 in both backends, so outputs agree to one bf16 ulp of the
    # final cast
    np.testing.assert_allclose(flash_out, xla_out, rtol=1e-2, atol=1e-3)
