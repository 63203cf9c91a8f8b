"""Fused LayerNorm / residual+LayerNorm kernels: numerics and gradients.

Pallas kernels run in interpreter mode on CPU; the reference is flax-style
LayerNorm math (f32 statistics). Gradient checks compare the hand-written
backward kernel against jax autodiff of the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.ops.fused_norm import (
    _ln_bwd_ref,
    _ln_ref,
    fused_add_layernorm,
    fused_add_layernorm_interpret,
    fused_layernorm,
    fused_layernorm_bwd_interpret,
    fused_layernorm_interpret,
)

EPS = 1e-6


def _data(m, c, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    return x, gamma, beta


def test_reference_matches_flax_layernorm():
    import flax.linen as nn

    x, gamma, beta = _data(16, 128)
    ln = nn.LayerNorm(epsilon=EPS)
    want = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    got = _ln_ref(x, gamma, beta, EPS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fwd_kernel_matches_reference():
    x, gamma, beta = _data(64, 256)
    want = _ln_ref(x, gamma, beta, EPS)
    got = fused_layernorm_interpret(x, gamma, beta, eps=EPS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_add_fwd_kernel_matches_reference():
    x, gamma, beta = _data(64, 256)
    branch, _, _ = _data(64, 256, seed=1)
    r_got, y_got = fused_add_layernorm_interpret(x, branch, gamma, beta,
                                                 eps=EPS)
    r_want = x + branch
    y_want = _ln_ref(r_want, gamma, beta, EPS)
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_want),
                               atol=1e-5)


def test_bwd_kernel_matches_autodiff():
    m, c = 64, 256
    x, gamma, beta = _data(m, c)
    dy = _data(m, c, seed=2)[0]

    def f(x, gamma, beta):
        return _ln_ref(x, gamma, beta, EPS)

    _, vjp = jax.vjp(f, x, gamma, beta)
    dx_want, dg_want, db_want = vjp(dy)

    dx, dg, db = fused_layernorm_bwd_interpret(x, gamma, dy, eps=EPS)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_want), atol=2e-4)


def test_bwd_kernel_accumulates_across_grid_steps():
    # m=64 rows with a forced small block => several sequential grid steps
    # must accumulate dgamma/dbeta (c=128 keeps rows_per_step at 1024>64 so
    # use a larger m to force multiple blocks).
    m, c = 4096, 128
    x, gamma, beta = _data(m, c)
    dy = _data(m, c, seed=3)[0]
    _, vjp = jax.vjp(lambda a, g, b: _ln_ref(a, g, b, EPS), x, gamma, beta)
    dx_want, dg_want, db_want = vjp(dy)
    dx, dg, db = fused_layernorm_bwd_interpret(x, gamma, dy, eps=EPS)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_want),
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_want),
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_want), atol=2e-4)


def test_bwd_kernel_with_residual_cotangent():
    m, c = 64, 256
    x, gamma, beta = _data(m, c)
    dy = _data(m, c, seed=4)[0]
    dr = _data(m, c, seed=5)[0]
    dx_ln, dg_want, db_want = _ln_bwd_ref(x, gamma, dy, EPS)
    dx_want = dx_ln + dr
    dx, dg, db = fused_layernorm_bwd_interpret(x, gamma, dy, eps=EPS, dr=dr)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_want), atol=2e-4)


def test_public_api_cpu_fallback_grads():
    # on CPU the public functions route to the XLA reference; the custom_vjp
    # must still agree with autodiff of plain layernorm composition
    x, gamma, beta = _data(48, 128)
    branch = _data(48, 128, seed=7)[0]

    def fused(x, branch, gamma, beta):
        r, y = fused_add_layernorm(x, branch, gamma, beta, eps=EPS)
        return jnp.sum(y * y) + jnp.sum(r)

    def plain(x, branch, gamma, beta):
        r = x + branch
        y = _ln_ref(r, gamma, beta, EPS)
        return jnp.sum(y * y) + jnp.sum(r)

    g_fused = jax.grad(fused, argnums=(0, 1, 2, 3))(x, branch, gamma, beta)
    g_plain = jax.grad(plain, argnums=(0, 1, 2, 3))(x, branch, gamma, beta)
    for a, b in zip(g_fused, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_layernorm_nd_shapes():
    x, gamma, beta = _data(8 * 16, 128)
    x3 = x.reshape(8, 16, 128)
    got = fused_layernorm(x3, gamma, beta, eps=EPS)
    want = _ln_ref(x, gamma, beta, EPS).reshape(8, 16, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bf16_inputs_f32_stats():
    x, gamma, beta = _data(64, 256)
    xb = x.astype(jnp.bfloat16)
    got = fused_layernorm_interpret(xb, gamma, beta, eps=EPS)
    want = _ln_ref(xb, gamma, beta, EPS)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want, dtype=np.float32),
        atol=2e-2,
    )
