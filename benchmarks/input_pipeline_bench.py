"""Input-fed train-step benchmark: real host pipeline vs synthetic batches.

Generates an on-disk JPEG corpus, then times the flagship CLIP train step
(a) on a device-resident synthetic batch and (b) fed per step from the host
pipeline: native fastloader batched train decode → **uint8 to device** →
normalization inside the jitted step (4x less host→device traffic, zero
host-side float math) with a background prefetch thread overlapping the
async device step.

Context: this dev host has a single CPU core (`nproc`=1); production TPU VM
hosts have ~28-112 vCPUs. The bench therefore also reports the measured
per-image decode cost and the host-core count at which the input pipeline
breaks even with the device step (<5% loss), which is the deployable claim.
"""

from __future__ import annotations

import io
import os
import sys
import threading
import time
from queue import Queue

import numpy as np

os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _flagship_task, _synthetic_batch  # noqa: E402

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def make_corpus(n=512, w=500, h=375, quality=85):
    """Photo-like JPEGs (~0.57 bytes/px, the ImageNet ballpark): low-frequency
    content + sensor-ish grain. Pure noise encodes at ~1.5 bytes/px — a
    worst-case Huffman stream ~2.5x costlier to entropy-decode than any real
    photograph — and was replaced as unrepresentative (round 3)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    jpegs = []
    for _ in range(n):
        base = (rng.random((h * 2 // 4, w * 2 // 4, 3)) * 255).astype(np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((w, h), Image.BILINEAR),
            dtype=np.float32,
        )
        img += rng.normal(0.0, 8.0, img.shape)
        img = np.clip(img, 0, 255).astype(np.uint8)
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

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)

    def train_step(params, opt_state, batch, rng):
        batch = dict(batch)
        rgb = batch["rgb"]
        if rgb.dtype == jnp.uint8:  # device-side normalize from raw bytes
            rgb = (rgb.astype(jnp.float32) / 255.0 - mean) / std
            batch["rgb"] = rgb.astype(jnp.bfloat16)

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

    # --- host pipeline: decode cost and per-core budget ---
    print(f"host cores: {os.cpu_count()}; native fastloader:",
          native.available(), flush=True)
    jpegs = make_corpus(n=512)
    text_rng = np.random.default_rng(2)

    def host_batch(step_idx):
        idx = np.arange(batch_size) * 2 % len(jpegs)
        seeds = step_idx * batch_size + np.arange(batch_size)
        imgs = native.decode_jpeg_batch_train(
            [jpegs[i] for i in idx], 224, seeds=seeds
        )  # uint8 (B, 224, 224, 3); normalization happens on device
        ids = text_rng.integers(2, 49407, (batch_size, 77)).astype(np.int32)
        ids[:, -1] = 49407
        return {"rgb": jnp.asarray(imgs), "text": jnp.asarray(ids)}

    t0 = time.perf_counter()
    for i in range(3):
        host_batch(100 + i)
    dt_host = (time.perf_counter() - t0) / 3
    per_image_ms = dt_host / batch_size * 1e3
    cores_needed = dt_host / dt_synth
    print(f"host pipeline: {dt_host*1e3:.0f} ms/batch "
          f"({per_image_ms:.2f} ms/image decode+aug on 1 core); "
          f"break-even at >= {cores_needed:.1f} host cores "
          f"(v5e hosts have 28+ vCPU/chip)", flush=True)

    # --- input-fed with background prefetch (realistic overlap) ---
    q: Queue = Queue(maxsize=2)

    def producer():
        for i in range(n_steps + 1):
            q.put(host_batch(i))

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    batch = q.get()
    p, o, loss = step(p, o, batch, rng)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        batch = q.get()
        p, o, loss = step(p, o, batch, rng)
    float(loss)
    dt_fed = (time.perf_counter() - t0) / n_steps
    ratio = dt_fed / dt_synth
    print(f"input-fed (prefetch overlap): {dt_fed*1e3:.1f} ms/step -> "
          f"{batch_size/dt_fed:.0f} pairs/s ({(ratio-1)*100:+.1f}% vs "
          f"synthetic; input-bound when host cores < break-even)", flush=True)


if __name__ == "__main__":
    main()
