"""Pallas flash attention vs XLA attention across sequence lengths.

Usage: python benchmarks/attention_kernels.py [seq_len ...]
Round-1 v5e results (fwd+bwd, bf16): XLA wins at ≤4096; the flash kernel wins
at 16384 (59 vs 65 ms) and keeps O(N) memory where XLA's f32 logits approach
the HBM limit. The dispatcher default threshold is 8192.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.common import time_steps
    from mmlearn_tpu.ops.flash_attention import _attention_xla, _flash_attention

    seqs = [int(s) for s in sys.argv[1:]] or [512, 4096, 16384]
    d, h = 64, 8
    rng = np.random.default_rng(0)
    for n in seqs:
        b = max(1, 2**18 // (n * h))  # keep memory modest across seq lens
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        mask = jnp.ones((b, n), bool)
        scale = d ** -0.5
        block = min(512, n)

        results = {"seq": n, "batch": b}
        for name, fn in [
            ("pallas", lambda qq, k=k, v=v: _flash_attention(
                qq, k, v, mask, scale, False, block, block, False)),
            ("xla", lambda qq, k=k, v=v: _attention_xla(
                qq, k, v, mask, scale, False)),
        ]:
            g = jax.jit(lambda qq: jax.grad(
                lambda x: fn(x).astype(jnp.float32).sum())(qq).sum())
            try:
                sec = time_steps(lambda: g(q), n_warmup=2, n_steps=5)
                results[f"{name}_fwd_bwd_ms"] = round(sec * 1000, 1)
            except Exception as err:
                results[f"{name}_fwd_bwd_ms"] = f"FAILED:{type(err).__name__}"
        print(json.dumps(results))


if __name__ == "__main__":
    main()
