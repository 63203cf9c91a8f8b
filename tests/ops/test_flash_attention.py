"""Correctness tests for the Pallas flash-attention kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.ops.flash_attention import (
    _attention_xla,
    flash_attention,
    flash_attention_interpret,
)


def _rand_qkv(rng, b=2, h=3, n=64, d=32, nk=None):
    nk = nk or n
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, nk, d)), jnp.float32)
    return q, k, v


def test_kernel_matches_xla_unmasked(rng):
    q, k, v = _rand_qkv(rng)
    expected = _attention_xla(q, k, v, None, q.shape[-1] ** -0.5, False)
    got = flash_attention_interpret(q, k, v)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_kernel_matches_xla_masked(rng):
    q, k, v = _rand_qkv(rng, n=40, nk=56)
    mask = jnp.asarray(rng.random((2, 56)) > 0.3)
    mask = mask.at[:, 0].set(True)  # keep at least one valid key
    expected = _attention_xla(q, k, v, mask, q.shape[-1] ** -0.5, False)
    got = flash_attention_interpret(q, k, v, mask)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_kernel_matches_xla_causal(rng):
    q, k, v = _rand_qkv(rng, n=48, d=16)
    expected = _attention_xla(q, k, v, None, q.shape[-1] ** -0.5, True)
    got = flash_attention_interpret(q, k, v, causal=True)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_kernel_unaligned_seq(rng):
    # 197 = ViT-B/16 sequence length with CLS token
    q, k, v = _rand_qkv(rng, b=1, h=2, n=197, d=32)
    expected = _attention_xla(q, k, v, None, q.shape[-1] ** -0.5, False)
    got = flash_attention_interpret(q, k, v)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_dispatcher_cpu_path_and_grads(rng):
    q, k, v = _rand_qkv(rng, b=1, h=2, n=32, d=16)

    def loss(q, k, v):
        return flash_attention(q, k, v).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return _attention_xla(q, k, v, None, q.shape[-1] ** -0.5, False).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_fully_masked_rows_match_xla(rng):
    # Fully-masked rows degrade to uniform attention in both paths (they are
    # padding and excluded downstream); the two paths must agree.
    q, k, v = _rand_qkv(rng, b=1, h=1, n=8, d=16)
    mask = jnp.zeros((1, 8), dtype=bool)
    got = flash_attention_interpret(q, k, v, mask)
    expected = _attention_xla(q, k, v, mask, q.shape[-1] ** -0.5, False)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_bfloat16_io(rng):
    q, k, v = _rand_qkv(rng, n=16, d=16)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention_interpret(q, k, v)
    assert got.dtype == jnp.bfloat16
    expected = _attention_xla(q, k, v, None, q.shape[-1] ** -0.5, False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), atol=2e-2
    )


def test_forward_pallas_emits_lse(rng):
    from mmlearn_tpu.ops.flash_attention import _flash_forward_pallas

    q, k, v = _rand_qkv(rng, b=1, h=2, n=32, d=16)
    mask = jnp.ones((1, 32), bool)
    out, lse = _flash_forward_pallas(
        q, k, v, mask, 16**-0.5, False, 128, 128, interpret=True
    )
    # lse must equal the dense logsumexp of the scaled scores
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * 16**-0.5
    expected = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(
        np.asarray(lse).reshape(2, 32), expected.reshape(2, 32), atol=2e-5
    )


@pytest.mark.parametrize("causal", [False, True])
def test_backward_kernels_match_xla(rng, causal):
    from mmlearn_tpu.ops.flash_attention import (
        _flash_backward_pallas,
        _flash_forward_pallas,
    )

    b, h, n, d = 1, 2, 40, 16  # unaligned seq exercises padding
    q, k, v = _rand_qkv(rng, b=b, h=h, n=n, d=d)
    mask = jnp.asarray(rng.random((b, n)) > 0.2)
    mask = mask.at[:, 0].set(True)
    scale = d**-0.5

    out, lse = _flash_forward_pallas(
        q, k, v, mask, scale, causal, 16, 16, interpret=True
    )
    g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    dq, dk, dv = _flash_backward_pallas(
        q, k, v, mask, out, lse, g, scale, causal, 16, 16, interpret=True
    )

    def ref(q, k, v):
        return _attention_xla(q, k, v, mask, scale, causal)

    _, vjp = jax.vjp(ref, q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), atol=3e-4)
