"""Microbenchmark: fused short-seq MHA kernel vs XLA attention on TPU.

Times the full attention region as the model sees it — from packed qkv
(B, N, 3C) to output (B, N, C) — so XLA's layout work (transposes to
(b,h,n,d) and back) is charged to the XLA path, exactly as in the train step.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mmlearn_tpu.ops.fused_attention import fused_mha  # noqa: E402


def time_fn(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def xla_attention(qkv, num_heads, causal):
    """Current model XLA path: [q|k|v]-major reshape + einsum attention."""
    b, n, three_c = qkv.shape
    d = three_c // (3 * num_heads)
    x = qkv.reshape(b, n, 3, num_heads, d)
    q, k, v = (jnp.transpose(x[:, :, i], (0, 2, 1, 3)) for i in range(3))
    pref = jnp.bfloat16 if qkv.dtype == jnp.bfloat16 else jnp.float32
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=pref) * (
        jnp.asarray(d, pref) ** -0.5
    )
    if causal:
        cm = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(cm, s, jnp.asarray(-3e38, pref))
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, three_c // 3)


def main():
    print("backend:", jax.default_backend(),
          "group override:", os.environ.get("MMLEARN_FUSED_ATTN_GROUP"))
    cases = [
        ("vit_b16", 256, 197, 12, 64, False),
        ("clip_txt", 256, 77, 8, 64, True),
    ]
    for name, b, n, h, d, causal in cases:
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            rng.standard_normal((b, n, 3 * h * d)).astype(np.float32),
            jnp.bfloat16,
        )
        flops_fwd = 4 * b * h * n * n * d

        xla_f = jax.jit(lambda x: xla_attention(x, h, causal))
        fused_f = jax.jit(lambda x: fused_mha(x, num_heads=h, causal=causal))

        def mk_grad(fn):
            return jax.jit(jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2)))

        xla_g = mk_grad(lambda x: xla_attention(x, h, causal))
        fused_g = mk_grad(lambda x: fused_mha(x, num_heads=h, causal=causal))

        # numerics sanity on-device (same head-major packing both sides)
        from mmlearn_tpu.ops.fused_attention import _mha_reference_xla
        o1 = np.asarray(jax.jit(
            lambda x: _mha_reference_xla(x, None, h, d**-0.5, causal))(qkv),
            np.float32)
        o2 = np.asarray(fused_f(qkv), np.float32)
        err = np.abs(o1 - o2).max()

        t_xf = time_fn(xla_f, qkv)
        t_ff = time_fn(fused_f, qkv)
        t_xg = time_fn(xla_g, qkv)
        t_fg = time_fn(fused_g, qkv)
        print(
            f"{name}: fwd xla {t_xf*1e3:.2f} ms ({flops_fwd/t_xf/1e12:.1f} TF/s) "
            f"| fused {t_ff*1e3:.2f} ms ({flops_fwd/t_ff/1e12:.1f} TF/s) "
            f"| fwd+bwd xla {t_xg*1e3:.2f} | fused {t_fg*1e3:.2f} ms "
            f"| max|Δout|={err:.4f}"
        )


if __name__ == "__main__":
    main()
