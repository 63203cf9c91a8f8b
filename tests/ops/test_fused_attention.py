"""Fused short-seq MHA kernel: numerics vs reference math, grads, packing.

The Pallas kernels run in interpreter mode on CPU; the reference is plain
XLA attention math on the same head-major packing, itself checked against a
torch-style [q|k|v]-major computation through ``interleave_qkv_heads``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.ops.fused_attention import (
    _mha_reference_xla,
    fused_mha,
    fused_mha_bwd_interpret,
    fused_mha_interpret,
    interleave_qkv_heads,
)


def _qkv(b, n, h, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((b, n, 3 * h * d)).astype(np.float32), dtype=dtype
    )


def _split_major(qkv, h, d):
    """[q|k|v]-major unpack -> (b, h, n, d) each."""
    b, n, _ = qkv.shape
    x = qkv.reshape(b, n, 3, h, d)
    return (jnp.transpose(x[:, :, i], (0, 2, 1, 3)) for i in range(3))


def _naive(q, k, v, scale, mask=None, causal=False):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e30)
    if causal:
        n = s.shape[-1]
        s = jnp.where(jnp.tril(jnp.ones((n, n), bool)), s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_reference_xla_matches_naive_through_interleave():
    b, n, h, d = 2, 13, 4, 8
    qkv_major = _qkv(b, n, h, d)
    q, k, v = _split_major(qkv_major, h, d)
    want = _naive(q, k, v, d**-0.5)  # (b, h, n, d)
    want = jnp.transpose(want, (0, 2, 1, 3)).reshape(b, n, h * d)

    qkv_hm = interleave_qkv_heads(qkv_major, h)
    got = _mha_reference_xla(qkv_hm, None, h, d**-0.5, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interleave_roundtrip_shapes():
    # kernel (C, 3C), bias (3C,), stacked (depth, C, 3C)
    h = 4
    k = np.arange(16 * 48).reshape(16, 48).astype(np.float32)
    ik = interleave_qkv_heads(k, h)
    assert ik.shape == k.shape
    bias = np.arange(48).astype(np.float32)
    ib = interleave_qkv_heads(bias, h)
    assert ib.shape == bias.shape
    stacked = np.stack([k, k + 1])
    ist = interleave_qkv_heads(stacked, h)
    assert ist.shape == stacked.shape
    np.testing.assert_array_equal(ist[0], ik)
    # interleave is a permutation: sorted values identical
    np.testing.assert_array_equal(np.sort(ik, axis=None), np.sort(k, axis=None))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("n", [13, 77, 197])
def test_pallas_fwd_matches_reference(n, causal):
    b, h, d = 2, 3, 16
    qkv = interleave_qkv_heads(_qkv(b, n, h, d, seed=n), h)
    want = _mha_reference_xla(qkv, None, h, d**-0.5, causal)
    got = fused_mha_interpret(qkv, num_heads=h, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_fwd_key_mask():
    b, n, h, d = 2, 19, 2, 8
    qkv = interleave_qkv_heads(_qkv(b, n, h, d, seed=7), h)
    mask = jnp.asarray(np.random.default_rng(1).random((b, n)) > 0.3)
    mask = mask.at[:, 0].set(True)  # at least one valid key
    want = _mha_reference_xla(qkv, mask, h, d**-0.5, False)
    got = fused_mha_interpret(qkv, mask, num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_bwd_matches_autodiff(causal):
    b, n, h, d = 2, 29, 2, 8
    qkv = interleave_qkv_heads(_qkv(b, n, h, d, seed=3), h)
    mask = jnp.ones((b, n), bool)
    g = jnp.asarray(
        np.random.default_rng(5).standard_normal((b, n, h * d)), jnp.float32
    )

    def ref(qkv):
        return _mha_reference_xla(qkv, mask, h, d**-0.5, causal)

    _, vjp = jax.vjp(ref, qkv)
    (want,) = vjp(g)
    got = fused_mha_bwd_interpret(qkv, g, mask, num_heads=h, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_mha_dispatches_xla_on_cpu_with_grad():
    """On CPU the public entry uses the XLA path; grads flow."""
    b, n, h, d = 2, 11, 2, 8
    qkv = interleave_qkv_heads(_qkv(b, n, h, d, seed=9), h)

    def loss(qkv):
        return jnp.sum(fused_mha(qkv, num_heads=h) ** 2)

    val, grad = jax.value_and_grad(loss)(qkv)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    # matches autodiff of the reference math exactly (same path)
    want = jax.grad(
        lambda x: jnp.sum(_mha_reference_xla(x, None, h, d**-0.5, False) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want), atol=1e-5)


def test_supports_fused_rejects_vmem_overflow_shapes():
    """Shapes whose backward temporaries cannot fit scoped VMEM even at one
    sample per program must route to XLA/flash instead of failing at
    compile time (e.g. D=64 at N=1024: ~31 MB of f32 temps vs the 16 MB
    stack)."""
    from mmlearn_tpu.ops.fused_attention import supports_fused

    assert supports_fused(12, 64, 197)     # ViT-B/16
    assert supports_fused(8, 64, 77)       # CLIP text
    assert supports_fused(12, 32, 118)     # I-JEPA predictor
    assert not supports_fused(12, 64, 1024)
    assert not supports_fused(12, 64, 2048)


def test_pick_group_respects_bwd_vmem_model():
    from mmlearn_tpu.ops.fused_attention import (
        _bwd_unit_bytes,
        _head_group,
        _pick_group,
    )

    for batch, seq, d in [(256, 197, 64), (256, 77, 64), (1024, 118, 32),
                          (64, 512, 64)]:
        hg = _head_group(d)
        g = _pick_group(batch, seq, d, hg)
        assert g * hg * _bwd_unit_bytes(seq, d) <= 20 * 1024 * 1024
        assert batch % g == 0


@pytest.mark.parametrize("h,d", [(4, 32), (8, 16), (4, 64)])
@pytest.mark.parametrize("causal", [False, True])
def test_packed_small_head_dim_fwd_matches_reference(h, d, causal, monkeypatch):
    """Lane-packed small-D kernel (block-diagonal K/V, full 128-lane
    matmuls — VERDICT r2 item 7): interpret-mode fwd vs XLA reference.
    The packed bodies are opt-in (MMLEARN_FUSED_ATTN_PACKED=1)."""
    monkeypatch.setenv("MMLEARN_FUSED_ATTN_PACKED", "1")
    from mmlearn_tpu.ops.fused_attention import _kernel_config, _packed_enabled

    assert _packed_enabled(d)
    b, n = 2, 29
    qkv = interleave_qkv_heads(_qkv(b, n, h, d, seed=d), h)
    # the packed body really dispatches (hg == 128/d in interpret mode)
    assert _kernel_config(qkv, h, interpret=True)[3] == 128 // d
    want = _mha_reference_xla(qkv, None, h, d**-0.5, causal)
    got = fused_mha_interpret(qkv, num_heads=h, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("h,d", [(4, 32), (8, 16), (4, 64)])
def test_packed_small_head_dim_fwd_key_mask(h, d, monkeypatch):
    monkeypatch.setenv("MMLEARN_FUSED_ATTN_PACKED", "1")
    b, n = 2, 19
    qkv = interleave_qkv_heads(_qkv(b, n, h, d, seed=7 + d), h)
    mask = jnp.asarray(np.random.default_rng(1).random((b, n)) > 0.3)
    mask = mask.at[:, 0].set(True)
    want = _mha_reference_xla(qkv, mask, h, d**-0.5, False)
    got = fused_mha_interpret(qkv, mask, num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("h,d", [(4, 32), (8, 16), (4, 64)])
@pytest.mark.parametrize("causal", [False, True])
def test_packed_small_head_dim_bwd_matches_autodiff(h, d, causal, monkeypatch):
    monkeypatch.setenv("MMLEARN_FUSED_ATTN_PACKED", "1")
    b, n = 2, 23
    qkv = interleave_qkv_heads(_qkv(b, n, h, d, seed=11 + d), h)
    mask = jnp.asarray(np.random.default_rng(2).random((b, n)) > 0.2)
    mask = mask.at[:, 0].set(True)
    g = jnp.asarray(
        np.random.default_rng(5).standard_normal((b, n, h * d)), jnp.float32
    )

    def ref(qkv):
        return _mha_reference_xla(qkv, mask, h, d**-0.5, causal)

    _, vjp = jax.vjp(ref, qkv)
    (want,) = vjp(g)
    got = fused_mha_bwd_interpret(qkv, g, mask, num_heads=h, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.parametrize("h,d", [(4, 32)])
def test_packed_disabled_env_falls_back(monkeypatch, h, d):
    from mmlearn_tpu.ops import fused_attention as fa

    monkeypatch.setenv("MMLEARN_FUSED_ATTN_PACKED", "0")
    assert not fa._packed_enabled(d)
    qkv = interleave_qkv_heads(_qkv(2, 17, h, d, seed=1), h)
    want = _mha_reference_xla(qkv, None, h, d**-0.5, False)
    got = fused_mha_interpret(qkv, num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
