"""I-JEPA ViT-B/16 full-train-step throughput benchmark.

Usage: python benchmarks/ijepa_train_step.py [batch_size]
Round-1 v5e result: 802 img/s @ b256 with bf16 attention scores.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from benchmarks.common import time_steps
    from mmlearn_tpu.modules.encoders import VisionTransformer
    from mmlearn_tpu.tasks import IJEPA

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    encoder = VisionTransformer(
        img_size=224, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        scan_blocks=True, remat=True, dtype=jnp.bfloat16,
    )
    task = IJEPA(
        encoder=encoder,
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3),
        ema_decay=0.996, ema_anneal_end_step=100000,
    )
    rng0 = np.random.default_rng(0)
    batch = {"rgb": np.asarray(
        rng0.standard_normal((batch_size, 224, 224, 3)), np.float32)}
    batch = task.prepare_batch(batch, step=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = task.init_params(jax.random.key(0), batch)
    extras = task.init_extras(params)
    tx = task.configure_optimizers(max_steps=10000)
    opt_state = tx.init(params)
    rng = jax.random.key(1)

    def step_fn(params, opt_state, extras, step):
        (loss, (_, e2)), grads = jax.value_and_grad(
            lambda p: task.loss_fn(p, batch, rng, extras), has_aux=True
        )(params)
        updates, o2 = tx.update(grads, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return p2, o2, task.post_update(p2, e2, step), loss

    jitted = jax.jit(step_fn, donate_argnums=(0, 1, 2))
    state = [params, opt_state, extras]

    def one_step():
        state[0], state[1], state[2], loss = jitted(
            state[0], state[1], state[2], jnp.asarray(0)
        )
        return loss

    sec = time_steps(one_step)
    print(json.dumps({
        "metric": "ijepa_vitb16_img_per_sec_per_chip",
        "value": round(batch_size / sec, 2),
        "unit": "img/sec/chip",
        "ms_per_step": round(sec * 1000, 1),
        "batch_size": batch_size,
    }))


if __name__ == "__main__":
    main()
