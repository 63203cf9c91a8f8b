"""Tests for the explicit-collectives layer (shard_map over the CPU mesh)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmlearn_tpu.parallel import (
    all_gather,
    create_mesh,
    local_loss_label_offset,
    pmean,
    psum,
)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(data=8)


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def test_all_gather_values(mesh, rng):
    x = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)

    def body(xs):
        return all_gather(xs, "data")

    out = _shard_map(body, mesh, P("data"), P("data"))(x)
    # every shard gathered the full array → result is x tiled across shards
    np.testing.assert_allclose(np.asarray(out)[:16], np.asarray(x), rtol=1e-6)


def test_all_gather_grad_modes(mesh, rng):
    """with_grad=True backprops to all shards; False only to the local shard
    (the reference's detached-gather semantics, contrastive.py:491-510)."""
    x = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)

    def loss(xs, with_grad):
        g = all_gather(xs, "data", with_grad=with_grad)
        # weight every gathered row by its global index → asymmetric pulls
        w = jnp.arange(g.shape[0], dtype=jnp.float32)[:, None]
        local = jnp.sum(g * w)
        return jax.lax.psum(local, "data")

    def grad_of(with_grad):
        fn = _shard_map(
            lambda xs: jax.grad(lambda v: loss(v, with_grad))(xs),
            mesh, P("data"), P("data"),
        )
        return np.asarray(fn(x))

    g_with = grad_of(True)
    g_without = grad_of(False)
    # differentiable gather: every row's grad = world_size * its weight ...
    # actually each row i of the global batch appears once in each shard's
    # gathered copy → grad accumulates over all 8 shards' losses
    w = np.arange(16, dtype=np.float32)[:, None]
    np.testing.assert_allclose(g_with, np.tile(w, (1, 4)) * 8, rtol=1e-6)
    # detached gather: gradient only flows through the local shard's rows,
    # once per shard (its own loss term), per row weight
    np.testing.assert_allclose(g_without, np.tile(w, (1, 4)), rtol=1e-6)


def test_psum_pmean(mesh):
    x = jnp.arange(8.0)

    def body(xs):
        return psum(xs, "data"), pmean(xs, "data")

    s, m = _shard_map(body, mesh, P("data"), (P("data"), P("data")))(x)
    np.testing.assert_allclose(np.asarray(s)[0], x.sum())
    np.testing.assert_allclose(np.asarray(m)[0], x.mean())


def test_local_loss_label_offset(mesh):
    def body(xs):
        off = local_loss_label_offset("data", local_batch=4)
        return jnp.full((1,), off, jnp.int32)

    out = _shard_map(body, mesh, P("data"), P("data"))(jnp.zeros(8))
    np.testing.assert_array_equal(np.asarray(out), np.arange(8) * 4)


def test_local_loss_infonce_equivalence(mesh, rng):
    """local×global logits + offset labels == global InfoNCE (per direction).

    This validates the reference's local_loss trick semantics
    (contrastive.py:162-219,327-340) in the explicit-SPMD regime.
    """
    b, d = 16, 8
    za = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    zb = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    # global reference: full BxB logits, diagonal positives
    logits = za @ zb.T
    lse = jax.nn.logsumexp(logits, axis=-1)
    global_ce = float((lse - jnp.diagonal(logits)).mean())

    def body(a_local, b_local):
        b_global = all_gather(b_local, "data")  # (B, d)
        local_logits = a_local @ b_global.T  # (B/8, B)
        offset = local_loss_label_offset("data", a_local.shape[0])
        labels = offset + jnp.arange(a_local.shape[0])
        lse_l = jax.nn.logsumexp(local_logits, axis=-1)
        pos = jnp.take_along_axis(local_logits, labels[:, None], axis=1)[:, 0]
        ce_sum = jnp.sum(lse_l - pos)
        return jnp.full((1,), jax.lax.psum(ce_sum, "data") / b)

    out = _shard_map(body, mesh, (P("data"), P("data")), P("data"))(za, zb)
    np.testing.assert_allclose(float(np.asarray(out)[0]), global_ce, rtol=1e-5)


def test_hybrid_mesh_small_carve_takes_per_slice_prefix():
    """A hybrid mesh smaller than the device pool must carve its devices
    per slice (slice-major emulation): a plain prefix would hand the
    builder devices spanning fewer slices than requested."""
    import jax

    from mmlearn_tpu.parallel.mesh import create_mesh

    devs = jax.devices()
    assert len(devs) == 8
    mesh = create_mesh(data=2, slices=2)  # 2 devices over 2 emulated slices
    picked = list(mesh.devices.flat)
    # slice-major: one device from each half of the pool
    assert picked == [devs[0], devs[4]]

    with __import__("pytest").raises(ValueError, match="slices"):
        create_mesh(data=3, slices=2)
