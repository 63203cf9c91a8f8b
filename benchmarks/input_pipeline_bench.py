"""Input-fed train-step benchmark: real host pipeline vs synthetic batches.

Generates an on-disk JPEG corpus, then times the flagship CLIP train step
(a) on a device-resident synthetic batch and (b) fed per step from the host
pipeline (native fastloader batched train decode + tokenized text +
device_put), with the natural async-dispatch overlap. Target (VERDICT
round-1 item 10): <5% throughput loss vs synthetic.
"""

from __future__ import annotations

import io
import os
import sys
import time

import numpy as np

os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _flagship_task, _synthetic_batch  # noqa: E402


def make_corpus(n=512, w=500, h=375, quality=85):
    from PIL import Image

    rng = np.random.default_rng(0)
    jpegs = []
    for _ in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=quality)
        jpegs.append(buf.getvalue())
    return jpegs


def main():
    from mmlearn_tpu import native

    batch_size = 256 if jax.default_backend() == "tpu" else 16
    task = _flagship_task(tiny=False)
    synth = _synthetic_batch(batch_size, 224, 77, 49408, dtype=jnp.bfloat16)
    params = task.init_params(jax.random.key(0), synth)
    tx = task.configure_optimizers(max_steps=10_000)
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, rng):
        def loss_wrap(p):
            loss, _ = task.loss_fn(p, batch, rng, {}, deterministic=False)
            return loss

        loss, grads = jax.value_and_grad(loss_wrap)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    rng = jax.random.key(1)

    # --- synthetic (device-resident) baseline ---
    p, o = params, opt_state
    for _ in range(3):
        p, o, loss = step(p, o, synth, rng)
    float(loss)
    t0 = time.perf_counter()
    n_steps = 10
    for _ in range(n_steps):
        p, o, loss = step(p, o, synth, rng)
    float(loss)
    dt_synth = (time.perf_counter() - t0) / n_steps
    print(f"synthetic: {dt_synth*1e3:.1f} ms/step -> "
          f"{batch_size/dt_synth:.0f} pairs/s", flush=True)

    # --- input-fed: JPEG decode + tokenized text per step ---
    print("native fastloader available:", native.available(), flush=True)
    jpegs = make_corpus(n=512)
    text_rng = np.random.default_rng(2)

    mean = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)

    def host_batch(step_idx):
        idx = np.arange(batch_size) * 2 % len(jpegs)
        seeds = step_idx * batch_size + np.arange(batch_size)
        imgs = native.decode_jpeg_batch_train(
            [jpegs[i] for i in idx], 224, seeds=seeds
        )
        imgs = ((imgs.astype(np.float32) / 255.0 - mean) / std).astype(
            jnp.bfloat16
        )
        ids = text_rng.integers(2, 49407, (batch_size, 77)).astype(np.int32)
        ids[:, -1] = 49407
        return {"rgb": jnp.asarray(imgs), "text": jnp.asarray(ids)}

    batch = host_batch(0)
    p, o, loss = step(p, o, batch, rng)
    float(loss)
    t0 = time.perf_counter()
    for i in range(n_steps):
        batch = host_batch(i + 1)  # host work overlaps the async device step
        p, o, loss = step(p, o, batch, rng)
    float(loss)
    dt_fed = (time.perf_counter() - t0) / n_steps
    ratio = dt_fed / dt_synth
    print(f"input-fed: {dt_fed*1e3:.1f} ms/step -> "
          f"{batch_size/dt_fed:.0f} pairs/s ({(ratio-1)*100:+.1f}% vs synthetic)",
          flush=True)

    # host pipeline cost alone
    t0 = time.perf_counter()
    for i in range(5):
        host_batch(100 + i)
    print(f"host pipeline alone: {(time.perf_counter()-t0)/5*1e3:.1f} ms/batch")


if __name__ == "__main__":
    main()
