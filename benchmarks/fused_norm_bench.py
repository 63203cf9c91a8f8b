"""Microbenchmark: fused Pallas LayerNorm vs XLA at model shapes (fwd+bwd)."""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("MMLEARN_FUSED_LN", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmlearn_tpu.ops.fused_norm import (  # noqa: E402
    _ln_ref,
    fused_add_layernorm,
    fused_layernorm,
)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(fn, *args, iters=50):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(
        *args
    ).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for (b, n, c) in [(256, 197, 768), (256, 77, 512), (256, 256, 1024)]:
        m = b * n
        key = jax.random.key(0)
        x = jax.random.normal(key, (b, n, c), jnp.bfloat16)
        br = jax.random.normal(jax.random.key(1), (b, n, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        dy = jax.random.normal(jax.random.key(2), (b, n, c), jnp.bfloat16)

        # --- plain LN fwd+bwd
        @jax.jit
        def xla_step(x, gamma, beta, dy):
            def f(x, gamma, beta):
                return _ln_ref(x.reshape(m, c), gamma, beta, 1e-6)

            y, vjp = jax.vjp(f, x, gamma, beta)
            return y, vjp(dy.reshape(m, c))

        @jax.jit
        def pl_step(x, gamma, beta, dy):
            def f(x, gamma, beta):
                return fused_layernorm(x, gamma, beta)

            y, vjp = jax.vjp(f, x, gamma, beta)
            return y, vjp(dy)

        t_xla = timeit(xla_step, x, gamma, beta, dy)
        t_pl = timeit(pl_step, x, gamma, beta, dy)

        # --- residual add + LN fwd+bwd (sum both outputs into the loss path)
        @jax.jit
        def xla_add(x, br, gamma, beta, dy):
            def f(x, br, gamma, beta):
                r = x + br
                y = _ln_ref(r.reshape(m, c), gamma, beta, 1e-6)
                return r, y

            (r, y), vjp = jax.vjp(f, x, br, gamma, beta)
            return y, vjp((r, dy.reshape(m, c)))

        @jax.jit
        def pl_add(x, br, gamma, beta, dy):
            def f(x, br, gamma, beta):
                return fused_add_layernorm(x, br, gamma, beta)

            (r, y), vjp = jax.vjp(f, x, br, gamma, beta)
            return y, vjp((r, dy))

        t_xla_add = timeit(xla_add, x, br, gamma, beta, dy)
        t_pl_add = timeit(pl_add, x, br, gamma, beta, dy)

        gb = m * c * 2 / 1e9
        print(
            f"({b},{n},{c}) [{gb * 4:.2f} GB min traffic fwd+bwd] "
            f"LN: xla {t_xla:.3f} ms  pallas {t_pl:.3f} ms | "
            f"add+LN: xla {t_xla_add:.3f} ms  pallas {t_pl_add:.3f} ms"
        )


if __name__ == "__main__":
    main()
