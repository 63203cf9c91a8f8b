"""Fused kernel vs XLA attention at the I-JEPA predictor shape.

The predictor (B=1024 = b256 x 4 masks, N=118, H=12, D=32) runs the fused
kernel with a VMEM-capped unit batch (U=16). This probe measures whether
that capped kernel still beats XLA attention at this shape (fwd+bwd,
chained-jit timing per benchmarks/fused_attention_real_vs_replica.py).
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

from mmlearn_tpu.ops.fused_attention import (  # noqa: E402
    _mha_reference_xla,
    fused_mha,
)

B, N, H, D = 1024, 118, 12, 32
CHAIN = 6


def run(kind):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, N, H * 3 * D)) * 0.1, jnp.bfloat16
    )

    def attn(qkv):
        if kind == "fused":
            return fused_mha(qkv, num_heads=H)
        return _mha_reference_xla(qkv, None, H, float(D) ** -0.5, False)

    @jax.jit
    def chained(qkv):
        def body(qkv, _):
            def loss(qkv):
                o = attn(qkv)
                return jnp.sum(o.astype(jnp.float32) ** 2), o

            (l, o), g = jax.value_and_grad(loss, has_aux=True)(qkv)
            qkv = qkv + g.astype(qkv.dtype) * jnp.bfloat16(1e-3)
            return qkv, None

        qkv, _ = jax.lax.scan(body, qkv, None, length=CHAIN)
        return qkv

    for _ in range(3):
        out = chained(qkv)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = chained(qkv)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / CHAIN


def main():
    flops = 7 * 2 * B * H * N * N * D  # fwd(2) + bwd(5) matmul units
    for kind in ["fused", "xla"]:
        try:
            dt = run(kind)
            print(
                f"{kind:6s}: {dt*1e3:6.2f} ms/call (fwd+bwd) "
                f"{flops/dt/1e12:5.1f} TF/s", flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
