"""Attention module routes through ring attention on a seq-sharded mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.modules.encoders.vision import VisionTransformer
from mmlearn_tpu.modules.layers.attention import Attention
from mmlearn_tpu.parallel.mesh import create_mesh, set_global_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


@pytest.fixture
def _clear_mesh():
    yield
    set_global_mesh(None)


def test_attention_module_matches_on_seq_mesh(_clear_mesh):
    attn = Attention(num_heads=4, qkv_bias=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 64)), jnp.float32
    )
    set_global_mesh(None)
    params = attn.init(jax.random.key(0), x)
    want = attn.apply(params, x)

    set_global_mesh(create_mesh(data=1, fsdp=1, seq=8, model=1))
    got = jax.jit(functools.partial(attn.apply, params))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_vit_forward_and_grads_on_seq_mesh(_clear_mesh):
    """Full tower: forward + grads agree between seq-sharded and plain."""
    vit = VisionTransformer(
        img_size=16, patch_size=4, embed_dim=32, depth=2, num_heads=4,
        use_cls_token=False, global_pool="avg", proj_dim=16,
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16, 16, 3)), jnp.float32
    )
    set_global_mesh(None)
    params = vit.init(jax.random.key(0), x)

    def loss(p, x):
        return jnp.sum(jnp.square(vit.apply(p, x).pooler_output))

    l_want, g_want = jax.value_and_grad(loss)(params, x)

    # 16 patches (no cls token) shard over a 4-way seq axis
    set_global_mesh(create_mesh(data=2, fsdp=1, seq=4, model=1))
    l_got, g_got = jax.jit(jax.value_and_grad(loss))(params, x)
    np.testing.assert_allclose(float(l_got), float(l_want), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_indivisible_seq_falls_back(_clear_mesh):
    """197 tokens don't divide an 8-way ring: the XLA path must serve it."""
    attn = Attention(num_heads=4)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 13, 64)), jnp.float32
    )
    set_global_mesh(None)
    params = attn.init(jax.random.key(0), x)
    want = attn.apply(params, x)
    set_global_mesh(create_mesh(data=1, fsdp=1, seq=8, model=1))
    got = attn.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
