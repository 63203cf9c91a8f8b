"""Benchmark: CLIP ViT-B/16 contrastive train-step throughput (pairs/sec/chip).

Runs the full jitted training step (forward both towers + InfoNCE + backward +
AdamW update, bf16 compute / f32 params, state donated) on synthetic
device-resident data, on whatever accelerator JAX exposes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the reference stack's throughput for the
same model/step on one A100 (PyTorch mixed precision CLIP ViT-B/16 ≈ 700
pairs/sec/GPU — see BASELINE.md; the reference publishes no number of its
own, so this is the standard community measurement for open_clip-style
training, used as the working baseline).
"""

from __future__ import annotations

import json
import time

A100_BASELINE_PAIRS_PER_SEC = 700.0


def main() -> None:
    import os

    # bf16 attention scores: +24% measured on v5e (softmax reductions still
    # f32 inside XLA); matches the reference's fp16-mixed autocast semantics
    os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")
    # MMLEARN_PLATFORM=cpu forces the CPU backend for smoke runs (the axon
    # TPU plugin ignores JAX_PLATFORMS and can block when the tunnel is down)
    from mmlearn_tpu._platform import force_platform_from_env

    force_platform_from_env()
    import jax

    # persistent compilation cache: repeat bench runs skip the (minutes-long
    # on tunneled TPUs) XLA compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_task, _synthetic_batch
    from mmlearn_tpu.compile_opts import step_jit

    backend = jax.default_backend()
    batch_size = 256 if backend == "tpu" else 16
    batch_size = int(os.environ.get("MMLEARN_BENCH_BATCH", batch_size))

    import jax.numpy as jnp
    import optax

    task = _flagship_task(tiny=False)
    batch = _synthetic_batch(batch_size, 224, 77, 49408, dtype=jnp.bfloat16)

    input_fed = os.environ.get("MMLEARN_BENCH_INPUT_FED", "1") != "0"
    # fresh-transport bandwidth must be probed BEFORE any program runs
    # (see _h2d_mbps); skipped entirely in synthetic-only mode
    h2d_fresh = _h2d_mbps() if input_fed else 0.0

    params = task.init_params(jax.random.key(0), batch)
    tx = task.configure_optimizers(max_steps=10_000)
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, rng):
        def loss_wrap(p):
            loss, (metrics, _) = task.loss_fn(p, batch, rng, {}, deterministic=False)
            return loss

        loss, grads = jax.value_and_grad(loss_wrap)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    step = step_jit(train_step, donate_argnums=(0, 1))

    rng = jax.random.key(1)
    # compile + warmup. NOTE: sync via float(loss) — device→host transfer is
    # the only reliable fence on tunneled PJRT platforms where
    # block_until_ready can return early; the step chain (donated state)
    # guarantees float(last_loss) waits for every step.
    params, opt_state, loss = step(params, opt_state, batch, rng)
    float(loss)
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    float(loss)

    # three steady-state windows: the median is the number of record and the
    # spread makes round-over-round deltas attributable (VERDICT r2 item 8)
    n_steps, n_windows = 10, 3
    windows = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, opt_state, loss = step(params, opt_state, batch, rng)
        float(loss)
        windows.append(batch_size * n_steps / (time.perf_counter() - t0))

    import statistics

    pairs_per_sec = statistics.median(windows)
    spread_pct = (
        100.0 * (max(windows) - min(windows)) / pairs_per_sec
        if pairs_per_sec
        else 0.0
    )
    result = {
        "metric": "clip_vitb16_contrastive_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
        "windows": [round(w, 2) for w in windows],
        "spread_pct": round(spread_pct, 2),
    }

    if input_fed:
        # tunneled-PJRT transport throttle (measured, docs/performance.md
        # "Input pipeline"): h2d drops ~1.5 GB/s → ~45 MB/s permanently
        # after ANY program running ≳80 ms executes (reproducible with a
        # plain XLA matmul loop, unrelated to this framework). Every
        # input-fed mode on this rig is capped by post-step transport, not
        # by host work — record both so the ratio is attributable.
        h2d_post = _h2d_mbps()
        bytes_per_pair = 224 * 224 * 3 + 77 * 4
        result["h2d_mbps_fresh"] = round(h2d_fresh, 0)
        result["h2d_mbps_post_step"] = round(h2d_post, 0)
        result["transport_ceiling_pairs_per_sec"] = round(
            h2d_post * 1e6 / bytes_per_pair, 1
        )
        # each input-fed phase STEPS the donated state. The phases mutate
        # this holder in place after EVERY step call, so even a phase that
        # raises mid-measurement leaves the live (params, opt_state) here —
        # the next phase must never touch the original donated buffers
        # (use-after-free)
        state = [params, opt_state]
        try:
            fed = _input_fed_pairs_per_sec(step, state, batch_size, rng)
            result["input_fed_pairs_per_sec"] = round(fed, 2)
            result["input_fed_ratio"] = round(fed / pairs_per_sec, 3)
            result["host_cores"] = os.cpu_count()
            # the input-fed path is host-decode-bound on this 1-core dev
            # host; concurrent host load (e.g. a test run) collapses it.
            # Record the load average so the number is interpretable.
            result["host_load_1m"] = round(os.getloadavg()[0], 2)
        except Exception as err:  # noqa: BLE001 - input-fed is best-effort
            result["input_fed_error"] = f"{type(err).__name__}: {err}"
        try:
            # materialized-corpus mode: decode/resize ONCE offline into
            # packed TFRecord shards (datasets/materialize.py), train from
            # raw-tensor records — per-sample host cost is a memcpy. This
            # is the production input recipe; it must keep even a 1-core
            # host at ~synthetic step rate.
            tfr = _input_fed_tfrecord_pairs_per_sec(step, state, batch_size, rng)
            result["input_fed_tfrecord_pairs_per_sec"] = round(tfr, 2)
            result["input_fed_tfrecord_ratio"] = round(tfr / pairs_per_sec, 3)
        except Exception as err:  # noqa: BLE001 - input-fed is best-effort
            result["input_fed_tfrecord_error"] = f"{type(err).__name__}: {err}"
        params, opt_state = state
        del state  # the holder must not keep the buffers alive below

    if os.environ.get("MMLEARN_BENCH_IJEPA", "1") != "0":
        # second flagship in the bench of record (VERDICT r3 item 6): a
        # regression in the I-JEPA step must be visible to the driver, not
        # only in BASELINE.md prose. Free the CLIP state first — the two
        # flagships don't fit HBM together with f32 optimizer state.
        del params, opt_state, batch
        import gc

        gc.collect()
        try:
            img_ps, ms = _ijepa_img_per_sec()
            result["ijepa_vitb16_img_per_sec_per_chip"] = round(img_ps, 2)
            result["ijepa_ms_per_step"] = round(ms, 1)
        except Exception as err:  # noqa: BLE001 - best-effort second metric
            result["ijepa_error"] = f"{type(err).__name__}: {err}"

    print(json.dumps(result))


def _h2d_mbps(n: int = 3) -> float:
    """Host→device bandwidth for a 38.5 MB uint8 batch (the input-fed
    transfer unit); a fresh host buffer per iteration rules out any
    host-buffer reuse fast paths."""
    import numpy as np

    import jax

    xs = [
        np.random.randint(0, 256, (256, 224, 224, 3), dtype=np.uint8)
        for _ in range(n + 1)
    ]
    d = jax.device_put(xs[-1])
    d.block_until_ready()
    t0 = time.perf_counter()
    for x in xs[:n]:
        d = jax.device_put(x)
        d.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    return xs[0].nbytes / 1e6 / dt


def _ijepa_img_per_sec(batch_size: int = 256):
    """I-JEPA ViT-B/16 full train step (student fwd/bwd + EMA teacher fwd +
    predictor + AdamW + EMA update), bf16, synthetic device-resident data.
    Same methodology as benchmarks/ijepa_train_step.py; median of 3
    windows. Returns (img/sec/chip, ms/step)."""
    import functools
    import statistics

    import numpy as np
    import optax

    import jax
    import jax.numpy as jnp

    from mmlearn_tpu.compile_opts import step_jit
    from mmlearn_tpu.modules.encoders import VisionTransformer
    from mmlearn_tpu.tasks import IJEPA

    if jax.default_backend() != "tpu":
        batch_size = min(batch_size, 8)
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

    jitted = step_jit(step_fn, donate_argnums=(0, 1, 2))
    state = [params, opt_state, extras]

    def one_step():
        state[0], state[1], state[2], loss = jitted(
            state[0], state[1], state[2], jnp.asarray(0)
        )
        return loss

    float(one_step())  # compile (device→host sync, see main())
    for _ in range(2):
        loss = one_step()
    float(loss)
    n_steps, windows = 5, []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            loss = one_step()
        float(loss)
        windows.append((time.perf_counter() - t0) / n_steps)
    sec = statistics.median(windows)
    return batch_size / sec, sec * 1000


def _input_fed_pairs_per_sec(step, state, batch_size, rng) -> float:
    """Input-fed throughput: JPEG corpus → native fastloader train decode →
    uint8 host→device → device-side normalization, with a background
    prefetch thread overlapping the async device step (VERDICT r2 item 5;
    full methodology in benchmarks/input_pipeline_bench.py). NOTE: this dev
    host has 1 CPU core — production TPU hosts have 28+ vCPU/chip, so the
    synthetic number is the compute capability and this is the 1-core
    input-bound floor."""
    import io
    import threading
    from queue import Queue

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from mmlearn_tpu import native

    # Photo-like corpus: low-frequency content + mild texture, which lands
    # near real-photo JPEG entropy (~0.5-0.7 bytes/px; ImageNet averages
    # ~0.6). The previous pure-noise corpus encoded at ~1.5 bytes/px —
    # worst-case Huffman streams ~2.5x costlier to entropy-decode than any
    # real photograph, which made the input-fed number unrepresentative.
    jpegs = _photo_jpegs()

    mean = jnp.asarray((0.48145466, 0.4578275, 0.40821073), jnp.float32)
    std = jnp.asarray((0.26862954, 0.26130258, 0.27577711), jnp.float32)
    text_rng = np.random.default_rng(2)

    def host_batch(step_idx):
        idx = np.arange(batch_size) * 2 % len(jpegs)
        seeds = step_idx * batch_size + np.arange(batch_size)
        imgs = native.decode_jpeg_batch_train(
            [jpegs[i] for i in idx], 224, seeds=seeds
        )  # uint8 NHWC; 4x less host→device traffic than f32
        ids = text_rng.integers(2, 49407, (batch_size, 77)).astype(np.int32)
        ids[:, -1] = 49407
        return {"rgb": jnp.asarray(imgs), "text": jnp.asarray(ids)}

    def normalize(b):
        rgb = (b["rgb"].astype(jnp.float32) / 255.0 - mean) / std
        return {"rgb": rgb.astype(jnp.bfloat16), "text": b["text"]}

    norm = jax.jit(normalize)
    n_steps = 10
    q: Queue = Queue(maxsize=2)

    def producer():
        # exactly the consumed count (1 warmup + n_steps): overproducing
        # leaves the thread blocked on a full queue at interpreter teardown
        try:
            for i in range(n_steps + 1):
                q.put(host_batch(i))
        except Exception as err:  # noqa: BLE001 - surface in the main thread
            q.put(err)

    def get_batch():
        # bounded wait: a silently-dead producer must fail the input-fed
        # measurement (caught by main()), not hang the whole benchmark
        item = q.get(timeout=300)
        if isinstance(item, Exception):
            raise item
        return item

    threading.Thread(target=producer, daemon=True).start()
    p, o = state
    # keep `state` pointing at the live buffers after every donating step:
    # if anything below raises, the caller's next phase must not reuse the
    # already-donated originals
    p, o, loss = step(p, o, norm(get_batch()), rng)
    state[:] = [p, o]
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        p, o, loss = step(p, o, norm(get_batch()), rng)
        state[:] = [p, o]
    float(loss)
    return batch_size * n_steps / (time.perf_counter() - t0)


def _photo_jpegs(n: int = 256) -> list:
    """Photo-like JPEG corpus: low-frequency content + mild texture, which
    lands near real-photo JPEG entropy (~0.5-0.7 bytes/px; ImageNet averages
    ~0.6). Pure noise encodes at ~1.5 bytes/px — worst-case Huffman streams
    ~2.5x costlier to entropy-decode than any real photograph."""
    import io

    import numpy as np
    from PIL import Image

    rng_np = np.random.default_rng(0)
    jpegs = []
    for _ in range(n):
        base = (rng_np.random((188, 250, 3)) * 255).astype(np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((500, 375), Image.BILINEAR),
            dtype=np.float32,
        )
        img += rng_np.normal(0.0, 8.0, img.shape)  # sensor-ish grain
        # measured ~0.57 bytes/px at q85 — in the ImageNet ballpark
        img = np.clip(img, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=85)
        jpegs.append(buf.getvalue())
    return jpegs


def _materialized_corpus(root: str = "/tmp/mmlearn_bench_tfr") -> list:
    """Materialize the bench corpus ONCE (decode/resize + tokenize →
    packed TFRecord shards via datasets/materialize.py); cached across runs.

    512 samples over 4 shards — large enough that a 256-batch epoch does
    not replay the page cache in lockstep, small enough to build in
    seconds."""
    import glob
    import os

    import numpy as np

    shards = sorted(glob.glob(os.path.join(root, "train-*.tfrecord")))
    if len(shards) == 4:
        return shards

    from mmlearn_tpu import native
    from mmlearn_tpu.datasets.materialize import materialize

    jpegs = _photo_jpegs()
    text_rng = np.random.default_rng(2)

    def samples():
        for i in range(512):
            img = native.decode_jpeg_batch_train(
                [jpegs[i % len(jpegs)]], 224, seeds=np.asarray([i])
            )[0]
            ids = text_rng.integers(2, 49407, (77,)).astype(np.int32)
            ids[-1] = 49407
            yield {"rgb": img, "text": ids, "example_index": i}

    res = materialize(samples(), root, shard_size=128, prefix="train")
    return res.shards


def _input_fed_tfrecord_pairs_per_sec(step, state, batch_size, rng) -> float:
    """Input-fed throughput from a MATERIALIZED corpus: packed TFRecord
    records (raw uint8 224x224x3 + int32 token ids) → frombuffer memcpy →
    uint8 host→device → device-side normalization, background prefetch
    overlapping the async device step. The host work per sample is one
    pread + protobuf walk + two memcpys — the production TPU input recipe
    (docs/performance.md "Input pipeline")."""
    import threading
    import time as _time
    from queue import Queue

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mmlearn_tpu.datasets.materialize import MaterializedDataset

    shards = _materialized_corpus()
    ds = MaterializedDataset(shards)
    n = len(ds)

    mean = jnp.asarray((0.48145466, 0.4578275, 0.40821073), jnp.float32)
    std = jnp.asarray((0.26862954, 0.26130258, 0.27577711), jnp.float32)

    def host_batch(step_idx):
        imgs = np.empty((batch_size, 224, 224, 3), np.uint8)
        ids = np.empty((batch_size, 77), np.int32)
        base = step_idx * batch_size
        for b in range(batch_size):
            ex = ds[(base + b) % n]
            imgs[b] = ex["rgb"]
            ids[b] = ex["text"]
        return {"rgb": jnp.asarray(imgs), "text": jnp.asarray(ids)}

    def normalize(b):
        rgb = (b["rgb"].astype(jnp.float32) / 255.0 - mean) / std
        return {"rgb": rgb.astype(jnp.bfloat16), "text": b["text"]}

    norm = jax.jit(normalize)
    n_steps = 10
    q: Queue = Queue(maxsize=2)

    def producer():
        try:
            for i in range(n_steps + 1):
                q.put(host_batch(i))
        except Exception as err:  # noqa: BLE001 - surface in the main thread
            q.put(err)

    def get_batch():
        item = q.get(timeout=300)
        if isinstance(item, Exception):
            raise item
        return item

    threading.Thread(target=producer, daemon=True).start()
    p, o = state
    # see _input_fed_pairs_per_sec: `state` must track the live buffers
    p, o, loss = step(p, o, norm(get_batch()), rng)
    state[:] = [p, o]
    float(loss)
    t0 = _time.perf_counter()
    for _ in range(n_steps):
        p, o, loss = step(p, o, norm(get_batch()), rng)
        state[:] = [p, o]
    float(loss)
    return batch_size * n_steps / (_time.perf_counter() - t0)


def main_with_retries(attempts: int = 4) -> None:
    """Retry transient tunneled-compile failures (HTTP 500 from the remote
    compile helper); the persistent cache makes later attempts cheap.

    Backend-unavailable gets a longer window (40 tries, 90 s apart ≈ 60
    min): the tunneled TPU has been observed to drop out for 30+ minute
    stretches, and a missing BENCH record costs a whole round."""
    import time as _time
    import traceback

    unavailable_attempts = int(
        __import__("os").environ.get("MMLEARN_BENCH_UNAVAILABLE_RETRIES", 12)
    )
    compile_failures = backend_failures = 0
    while True:
        try:
            main()
            return
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            backend_down = (
                "UNAVAILABLE" in msg or "Unavailable" in msg
                or "Unable to initialize backend" in msg
            )
            transient = (
                backend_down or "remote_compile" in msg or "INTERNAL" in msg
            )
            if backend_down:
                backend_failures += 1
                retry = backend_failures < unavailable_attempts
                sleep = 90
            else:
                compile_failures += 1
                retry = transient and compile_failures < attempts
                sleep = 45
            if not retry:
                raise
            traceback.print_exc()
            print(
                "transient failure "
                f"(backend_down={backend_down}, try {backend_failures + compile_failures}), "
                "retrying",
                flush=True,
            )
            _time.sleep(sleep)


if __name__ == "__main__":
    main_with_retries()
