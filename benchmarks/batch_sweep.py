"""Batch-size sweep for the flagship CLIP contrastive train step.

Round-1 found negative scaling past b256 (f32 attention residuals through
HBM); the fused MHA kernel removed those, so re-measure whether larger
batches now amortize fixed costs. Usage:

    python benchmarks/batch_sweep.py [batch ...]   # default: 256 384 512
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_task, _synthetic_batch
    from benchmarks.common import time_steps

    import jax.numpy as jnp

    batches = [int(a) for a in sys.argv[1:]] or [256, 384, 512]
    task = _flagship_task(tiny=False)

    for bs in batches:
        batch = _synthetic_batch(bs, 224, 77, 49408, dtype=jnp.bfloat16)
        params = task.init_params(jax.random.key(0), batch)
        tx = task.configure_optimizers(max_steps=10_000)
        opt_state = tx.init(params)

        def train_step(params, opt_state, batch, rng):
            def loss_wrap(p):
                loss, _ = task.loss_fn(p, batch, rng, {}, deterministic=False)
                return loss

            loss, grads = jax.value_and_grad(loss_wrap)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss

        step = jax.jit(train_step, donate_argnums=(0, 1))
        state = {"p": params, "o": opt_state}

        def run(state=state, batch=batch):
            state["p"], state["o"], loss = step(
                state["p"], state["o"], batch, jax.random.key(1)
            )
            return loss

        try:
            sec = time_steps(run)
        except Exception as e:  # noqa: BLE001
            print(f"b{bs}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            continue
        print(
            f"b{bs}: {sec * 1e3:.1f} ms/step, {bs / sec:.1f} pairs/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
