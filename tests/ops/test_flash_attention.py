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
