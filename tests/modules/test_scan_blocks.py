"""nn.scan block stack: numerical parity with the unrolled loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlearn_tpu.hf_utils import stack_block_params
from mmlearn_tpu.modules.encoders import TextTransformer, VisionTransformer


def _loop_and_scan(module_cls, **kwargs):
    loop = module_cls(scan_blocks=False, **kwargs)
    scan = module_cls(scan_blocks=True, **kwargs)
    return loop, scan


def test_vit_scan_matches_loop():
    loop, scan = _loop_and_scan(
        VisionTransformer,
        img_size=16, patch_size=8, embed_dim=32, depth=3, num_heads=4,
        use_cls_token=True, global_pool="cls", proj_dim=16,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    params = loop.init(jax.random.key(0), x)["params"]
    out_loop = loop.apply({"params": params}, x)

    scan_params = stack_block_params(dict(params), depth=3)
    out_scan = scan.apply({"params": scan_params}, x)
    np.testing.assert_allclose(
        np.asarray(out_scan.pooler_output), np.asarray(out_loop.pooler_output),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_scan.last_hidden_state),
        np.asarray(out_loop.last_hidden_state), atol=1e-5,
    )


def test_text_scan_matches_loop():
    loop, scan = _loop_and_scan(
        TextTransformer,
        vocab_size=50, max_length=12, embed_dim=32, depth=3, num_heads=4,
        causal=True, pooling="eos", proj_dim=16,
    )
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 49, (2, 12)),
                      jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    params = loop.init(jax.random.key(0), ids, mask)["params"]
    out_loop = loop.apply({"params": params}, ids, mask)
    scan_params = stack_block_params(dict(params), depth=3)
    out_scan = scan.apply({"params": scan_params}, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_scan.pooler_output), np.asarray(out_loop.pooler_output),
        atol=1e-5,
    )


def test_scan_init_shapes():
    scan = VisionTransformer(
        img_size=16, patch_size=8, embed_dim=32, depth=4, num_heads=4,
        scan_blocks=True,
    )
    x = jnp.ones((1, 16, 16, 3))
    params = scan.init(jax.random.key(0), x)["params"]
    qkv = params["block_stack"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert qkv.shape == (4, 32, 96)  # (depth, d, 3d)


def test_scan_grads_and_partitioning():
    from mmlearn_tpu.parallel import create_mesh, infer_param_specs

    scan = VisionTransformer(
        img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        scan_blocks=True,
    )
    x = jnp.ones((2, 16, 16, 3))
    params = scan.init(jax.random.key(0), x)["params"]
    g = jax.grad(
        lambda p: (scan.apply({"params": p}, x)[0].astype(jnp.float32) ** 2).sum()
    )(params)
    assert np.isfinite(jax.tree.leaves(g)[0]).all()

    mesh = create_mesh(data=2, fsdp=2, model=2)
    specs = infer_param_specs(params, mesh)
    qkv_spec = specs["block_stack"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert tuple(qkv_spec) == (None, "fsdp", "model")


def test_bert_scan_matches_loop():
    from mmlearn_tpu.modules.encoders import BertTextEncoder

    kwargs = dict(vocab_size=60, max_length=16, embed_dim=32, depth=3,
                  num_heads=4, mlp_ratio=2.0, pooling="cls")
    loop = BertTextEncoder(scan_blocks=False, **kwargs)
    scan = BertTextEncoder(scan_blocks=True, **kwargs)
    ids = jnp.asarray(np.random.default_rng(2).integers(1, 59, (2, 10)),
                      jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    params = loop.init(jax.random.key(0), ids, mask)["params"]
    out_loop = loop.apply({"params": params}, ids, mask)

    scan_params = stack_block_params(dict(params), depth=3,
                                     out_path=("blocks", "block"))
    out_scan = scan.apply({"params": scan_params}, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_scan.pooler_output), np.asarray(out_loop.pooler_output),
        atol=1e-5,
    )


def test_scan_unroll_matches_unroll1():
    """scan_unroll changes scheduling only: same params tree, same outputs
    and grads as the default unroll=1 scan."""
    kwargs = dict(img_size=16, patch_size=8, embed_dim=32, depth=4,
                  num_heads=4, use_cls_token=True, global_pool="cls",
                  scan_blocks=True, remat=True)
    m1 = VisionTransformer(**kwargs)
    m2 = VisionTransformer(scan_unroll=2, **kwargs)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 3)), jnp.float32
    )
    params = m1.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m1.apply(params, x)[0]),
        np.asarray(m2.apply(params, x)[0]),
        atol=1e-6,
    )
    g1 = jax.grad(lambda p: m1.apply(p, x)[0].sum())(params)
    g2 = jax.grad(lambda p: m2.apply(p, x)[0].sum())(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scan_unroll_must_divide_depth():
    kwargs = dict(img_size=16, patch_size=8, embed_dim=32, depth=4,
                  num_heads=4, scan_blocks=True, scan_unroll=3)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="scan_unroll"):
        VisionTransformer(**kwargs).init(jax.random.key(0), x)
