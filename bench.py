"""Benchmark: CLIP ViT-B/16 contrastive train-step throughput (pairs/sec/chip).

Runs the full jitted training step (forward both towers + InfoNCE + backward +
AdamW update, bf16 compute / f32 params, state donated) on synthetic
device-resident data, on whatever accelerator JAX exposes.

Prints the record JSON line ``{"metric", "value", "unit", "vs_baseline", ...}``
TWICE: once the moment the synthetic number is measured (so a later hang can
never lose it) and once enriched at the end. The driver parses a line either
way.

Un-losable by construction (round 4 lost its record to a tunnel wedge,
rc=124 with nothing printed — VERDICT r4 item 1):

- a monotonic wall-clock deadline (``MMLEARN_BENCH_DEADLINE_S``, default
  1500 s) is enforced by a watchdog thread started before backend init; at
  the deadline it prints whatever partial record exists and ``os._exit``\\ s —
  this fires even while the main thread is wedged inside an uninterruptible
  PJRT call (device_put / compile);
- every optional phase is budget-gated: it only starts if enough deadline
  remains, otherwise it is recorded as skipped;
- the h2d bandwidth probes run in a watchdogged daemon thread with a join
  timeout, so a wedged transport costs seconds, not the round;
- ``main_with_retries`` bounds its sleeps by the remaining deadline;
- ``MMLEARN_BENCH_WEDGE=<phase>`` force-hangs a phase (backend | h2d |
  synthetic | input_fed | tfrecord | ijepa) to test all of the above
  (tests/test_bench_deadline.py).

``vs_baseline`` compares against the reference stack's throughput for the
same model/step on one A100 (PyTorch mixed precision CLIP ViT-B/16 ≈ 700
pairs/sec/GPU — see BASELINE.md; the reference publishes no number of its
own, so this is the standard community measurement for open_clip-style
training, used as the working baseline).
"""

from __future__ import annotations

import json
import os
import threading
import time

A100_BASELINE_PAIRS_PER_SEC = 700.0

_T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("MMLEARN_BENCH_DEADLINE_S", "1500"))

#: the record of record — updated in place as phases complete, printed by
#: the early-emit, the final emit, AND the deadline watchdog (whichever
#: fire). Starts parseable: even a pre-measurement wedge yields a JSON line.
RESULT: dict = {
    "metric": "clip_vitb16_contrastive_pairs_per_sec_per_chip",
    "value": 0.0,
    "unit": "pairs/sec/chip",
    "vs_baseline": 0.0,
}
_RESULT_LOCK = threading.Lock()
_FINAL_EMITTED = threading.Event()


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _update(**kv) -> None:
    with _RESULT_LOCK:
        RESULT.update(kv)


def _emit() -> None:
    with _RESULT_LOCK:
        line = json.dumps(RESULT)
    print(line, flush=True)


def _maybe_wedge(phase: str) -> None:
    """Test knob: MMLEARN_BENCH_WEDGE=<phase> hangs here forever, simulating
    the tunnel wedge that cost round 4 its record."""
    if os.environ.get("MMLEARN_BENCH_WEDGE") == phase:
        time.sleep(10**9)


def _mark(msg: str) -> None:
    """Stderr breadcrumb with elapsed seconds: a stalled run's captured tail
    shows WHICH phase wedged (one observed tunnel stall left 20 min of
    silence with nothing attributable)."""
    import sys

    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _start_watchdog() -> None:
    def watchdog() -> None:
        while not _FINAL_EMITTED.is_set():
            rem = _remaining()
            if rem <= 0:
                break
            _FINAL_EMITTED.wait(min(rem, 5.0))
        if not _FINAL_EMITTED.is_set():
            _update(deadline_exceeded=True, deadline_s=DEADLINE_S)
            _emit()
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()


def _phase_allowed(name: str, budget_s: float) -> bool:
    """Gate an optional phase on the remaining deadline; record skips so a
    truncated run reads as truncated, not as 'covered everything'."""
    if _remaining() >= budget_s:
        return True
    with _RESULT_LOCK:
        RESULT.setdefault("skipped_phases", []).append(name)
    return False


def main() -> None:
    # bf16 attention scores: +24% measured on v5e (softmax reductions still
    # f32 inside XLA); matches the reference's fp16-mixed autocast semantics
    os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")
    # MMLEARN_PLATFORM=cpu forces the CPU backend for smoke runs (the axon
    # TPU plugin ignores JAX_PLATFORMS and can block when the tunnel is down)
    from mmlearn_tpu._platform import force_platform_from_env

    force_platform_from_env()
    _maybe_wedge("backend")
    _mark("backend init")
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
    # (see _h2d_mbps); skipped entirely in synthetic-only mode. Watchdogged:
    # a wedged transport fails the probe in 120 s instead of hanging the run.
    _mark("h2d fresh probe" if input_fed else "h2d probe skipped")
    h2d_fresh = _h2d_mbps_watchdogged("h2d") if input_fed else 0.0

    _mark("flagship init_params")
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
    _maybe_wedge("synthetic")
    _mark("synthetic compile+warmup")
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
    _mark("synthetic windows")
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
    _update(
        value=round(pairs_per_sec, 2),
        vs_baseline=round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
        windows=[round(w, 2) for w in windows],
        spread_pct=round(spread_pct, 2),
    )
    # the number of record exists NOW — flush it before any enrichment
    # phase gets a chance to hang (VERDICT r4 item 1a)
    _emit()

    # achieved TFLOP/s + MFU for the flagship step (VERDICT r4 item 4):
    # analytic jaxpr counter (trace-only — XLA's cost_analysis counts scan
    # bodies once and Pallas kernels as zero, measured round 5)
    try:
        from mmlearn_tpu.trainer.trainer import (
            _compiled_step_flops,
            _device_peak_tflops,
        )

        step_flops = _compiled_step_flops(step, params, opt_state, batch, rng)
        if step_flops:
            sec_per_step = batch_size / pairs_per_sec
            tflops = step_flops / sec_per_step / 1e12
            _update(clip_achieved_tflops=round(tflops, 1))
            peak = _device_peak_tflops()
            if peak:
                _update(clip_mfu=round(tflops / peak, 3))
    except Exception as err:  # noqa: BLE001 - enrichment is best-effort
        _update(mfu_error=f"{type(err).__name__}: {err}")

    if input_fed:
        # tunneled-PJRT transport throttle (measured, docs/performance.md
        # "Input pipeline"): h2d drops ~1.5 GB/s → ~45 MB/s permanently
        # after ANY program running ≳80 ms executes (reproducible with a
        # plain XLA matmul loop, unrelated to this framework). Every
        # input-fed mode on this rig is capped by post-step transport, not
        # by host work — record both so the ratio is attributable.
        h2d_post = (
            _h2d_mbps_watchdogged("h2d_post")
            if _phase_allowed("h2d_post", 60.0)
            else 0.0
        )
        bytes_per_pair = 224 * 224 * 3 + 77 * 4
        _update(
            h2d_mbps_fresh=round(h2d_fresh, 0),
            h2d_mbps_post_step=round(h2d_post, 0),
            transport_ceiling_pairs_per_sec=round(
                h2d_post * 1e6 / bytes_per_pair, 1
            ),
        )
        # each input-fed phase STEPS the donated state. The phases mutate
        # this holder in place after EVERY step call, so even a phase that
        # raises mid-measurement leaves the live (params, opt_state) here —
        # the next phase must never touch the original donated buffers
        # (use-after-free)
        state = [params, opt_state]
        if _phase_allowed("input_fed", 180.0):
            _maybe_wedge("input_fed")
            _mark("input-fed phase")
            try:
                fed = _input_fed_pairs_per_sec(step, state, batch_size, rng)
                _update(
                    input_fed_pairs_per_sec=round(fed, 2),
                    input_fed_ratio=round(fed / pairs_per_sec, 3),
                    host_cores=os.cpu_count(),
                    # the input-fed path is host-decode-bound on this 1-core
                    # dev host; concurrent host load (e.g. a test run)
                    # collapses it. Record the load average so the number is
                    # interpretable.
                    host_load_1m=round(os.getloadavg()[0], 2),
                )
            except Exception as err:  # noqa: BLE001 - best-effort
                _update(input_fed_error=f"{type(err).__name__}: {err}")
        if _phase_allowed("tfrecord", 180.0):
            _maybe_wedge("tfrecord")
            _mark("tfrecord-fed phase")
            try:
                # materialized-corpus mode: decode/resize ONCE offline into
                # packed TFRecord shards (datasets/materialize.py), train
                # from raw-tensor records — per-sample host cost is a
                # memcpy. This is the production input recipe; it must keep
                # even a 1-core host at ~synthetic step rate.
                tfr = _input_fed_tfrecord_pairs_per_sec(
                    step, state, batch_size, rng
                )
                _update(
                    input_fed_tfrecord_pairs_per_sec=round(tfr, 2),
                    input_fed_tfrecord_ratio=round(tfr / pairs_per_sec, 3),
                )
            except Exception as err:  # noqa: BLE001 - best-effort
                _update(input_fed_tfrecord_error=f"{type(err).__name__}: {err}")
        params, opt_state = state
        del state  # the holder must not keep the buffers alive below

    if os.environ.get("MMLEARN_BENCH_IJEPA", "1") != "0" and _phase_allowed(
        "ijepa", 420.0
    ):
        # second flagship in the bench of record (VERDICT r3 item 6): a
        # regression in the I-JEPA step must be visible to the driver, not
        # only in BASELINE.md prose. Free the CLIP state first — the two
        # flagships don't fit HBM together with f32 optimizer state.
        del params, opt_state, batch
        import gc

        gc.collect()
        _maybe_wedge("ijepa")
        _mark("ijepa phase")
        try:
            img_ps, ms, ij_tflops, ij_mfu = _ijepa_img_per_sec()
            _update(
                ijepa_vitb16_img_per_sec_per_chip=round(img_ps, 2),
                ijepa_ms_per_step=round(ms, 1),
            )
            if ij_tflops:
                _update(ijepa_achieved_tflops=round(ij_tflops, 1))
            if ij_mfu:
                _update(ijepa_mfu=round(ij_mfu, 3))
        except Exception as err:  # noqa: BLE001 - best-effort second metric
            _update(ijepa_error=f"{type(err).__name__}: {err}")

    _emit()


def _h2d_mbps_watchdogged(phase: str, timeout_s: float = 120.0) -> float:
    """Run the h2d probe in a daemon thread with a bounded join: a wedged
    PJRT transport (r4's failure mode) must cost seconds, not the record.
    Returns 0.0 on timeout/error and notes it in the record."""
    out: list = []

    def probe() -> None:
        _maybe_wedge(phase)
        try:
            out.append(_h2d_mbps())
        except Exception as err:  # noqa: BLE001 - surface via the record
            out.append(err)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(min(timeout_s, max(1.0, _remaining() - 30.0)))
    if t.is_alive():
        _update(**{f"{phase}_error": "timeout (transport wedged?)"})
        return 0.0
    if out and isinstance(out[0], Exception):
        _update(**{f"{phase}_error": f"{type(out[0]).__name__}: {out[0]}"})
        return 0.0
    return float(out[0]) if out else 0.0


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
    windows. Returns (img/sec/chip, ms/step, achieved_tflops, mfu)."""
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
    tflops = mfu = 0.0
    try:
        from mmlearn_tpu.trainer.trainer import (
            _compiled_step_flops,
            _device_peak_tflops,
        )

        flops = _compiled_step_flops(
            jitted, state[0], state[1], state[2], jnp.asarray(0)
        )
        if flops:
            tflops = flops / sec / 1e12
            peak = _device_peak_tflops()
            if peak:
                mfu = tflops / peak
    except Exception:  # noqa: BLE001 - MFU is enrichment
        pass
    return batch_size / sec, sec * 1000, tflops, mfu


def _input_fed_pairs_per_sec(step, state, batch_size, rng) -> float:
    """Input-fed throughput: JPEG corpus → native fastloader train decode →
    uint8 host→device → device-side normalization, with the framework's
    ``DeviceFeeder`` overlapping host production with the async device step
    (VERDICT r4 item 5 — bench.py uses the same entry point as the trainer;
    methodology in benchmarks/input_pipeline_bench.py). NOTE: this dev host
    has 1 CPU core — production TPU hosts have 28+ vCPU/chip, so the
    synthetic number is the compute capability and this is the 1-core
    input-bound floor."""
    import numpy as np

    import jax.numpy as jnp

    from mmlearn_tpu import native
    from mmlearn_tpu.datasets.core.loader import DeviceFeeder

    # Photo-like corpus: low-frequency content + mild texture, which lands
    # near real-photo JPEG entropy (~0.5-0.7 bytes/px; ImageNet averages
    # ~0.6). The previous pure-noise corpus encoded at ~1.5 bytes/px —
    # worst-case Huffman streams ~2.5x costlier to entropy-decode than any
    # real photograph, which made the input-fed number unrepresentative.
    jpegs = _photo_jpegs()
    text_rng = np.random.default_rng(2)

    def host_batch(step_idx):
        idx = np.arange(batch_size) * 2 % len(jpegs)
        seeds = step_idx * batch_size + np.arange(batch_size)
        imgs = native.decode_jpeg_batch_train(
            [jpegs[i] for i in idx], 224, seeds=seeds
        )  # uint8 NHWC; 4x less host→device traffic than f32
        ids = text_rng.integers(2, 49407, (batch_size, 77)).astype(np.int32)
        ids[:, -1] = 49407
        return {"rgb": imgs, "text": ids}

    n_steps = 10
    feeder = DeviceFeeder(
        map(host_batch, range(n_steps + 1)),
        normalize=_clip_normalize, prefetch=2,
    )
    return _feeder_pairs_per_sec(step, state, feeder, batch_size, n_steps, rng)


def _clip_normalize(b):
    """uint8 → CLIP-normalized bf16, on device inside one jitted op."""
    import jax.numpy as jnp

    mean = jnp.asarray((0.48145466, 0.4578275, 0.40821073), jnp.float32)
    std = jnp.asarray((0.26862954, 0.26130258, 0.27577711), jnp.float32)
    rgb = (b["rgb"].astype(jnp.float32) / 255.0 - mean) / std
    return {"rgb": rgb.astype(jnp.bfloat16), "text": b["text"]}


def _feeder_pairs_per_sec(step, state, feeder, batch_size, n_steps, rng):
    """Shared measurement loop for the input-fed phases: one warmup step,
    then ``n_steps`` timed steps, keeping ``state`` pointing at the live
    donated buffers after EVERY call (use-after-free regression fixed in
    commit bc479dc; test: tests/datasets/test_device_feeder.py)."""
    with feeder:
        it = iter(feeder)
        p, o = state
        p, o, loss = step(p, o, next(it), rng)
        state[:] = [p, o]
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            p, o, loss = step(p, o, next(it), rng)
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
    uint8 host→device → device-side normalization via the framework's
    ``DeviceFeeder``. The host work per sample is one pread + protobuf walk
    + two memcpys — the production TPU input recipe (docs/performance.md
    "Input pipeline")."""
    import numpy as np

    from mmlearn_tpu.datasets.core.loader import DeviceFeeder
    from mmlearn_tpu.datasets.materialize import MaterializedDataset

    shards = _materialized_corpus()
    ds = MaterializedDataset(shards)
    n = len(ds)

    def host_batch(step_idx):
        imgs = np.empty((batch_size, 224, 224, 3), np.uint8)
        ids = np.empty((batch_size, 77), np.int32)
        base = step_idx * batch_size
        for b in range(batch_size):
            ex = ds[(base + b) % n]
            imgs[b] = ex["rgb"]
            ids[b] = ex["text"]
        return {"rgb": imgs, "text": ids}

    n_steps = 10
    feeder = DeviceFeeder(
        map(host_batch, range(n_steps + 1)),
        normalize=_clip_normalize, prefetch=2,
    )
    return _feeder_pairs_per_sec(step, state, feeder, batch_size, n_steps, rng)


def main_with_retries(attempts: int = 4) -> None:
    """Retry transient tunneled-compile failures (HTTP 500 from the remote
    compile helper); the persistent cache makes later attempts cheap.

    Every sleep is bounded by the remaining deadline: the watchdog's final
    emit must never be pre-empted by a retry ladder that outsleeps it
    (round 4's rc=124 — VERDICT r4 item 1c)."""
    import time as _time
    import traceback

    unavailable_attempts = int(
        os.environ.get("MMLEARN_BENCH_UNAVAILABLE_RETRIES", 12)
    )
    compile_failures = backend_failures = 0
    while True:
        try:
            # a fresh attempt owns the record: clear residue from failed
            # attempts (stale `error` from a transient failure would make a
            # SUCCESSFUL retry read as failed; `skipped_phases` re-appends)
            with _RESULT_LOCK:
                RESULT.pop("error", None)
                RESULT.pop("skipped_phases", None)
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
            _update(error=f"{type(e).__name__}: {msg[:300]}")
            # a retry must leave ≥60 s of deadline to actually re-run the
            # synthetic phase (cached compile); otherwise emit what exists
            if _remaining() - sleep < 60.0:
                retry = False
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
    _start_watchdog()
    try:
        main_with_retries()
    except Exception:
        import traceback

        traceback.print_exc()
    finally:
        # the record line is printed unconditionally — a failed run emits
        # value=0 + the error field rather than nothing (parsed != null)
        _FINAL_EMITTED.set()
        _emit()
        # skip interpreter teardown: a daemon thread may be wedged inside an
        # uninterruptible PJRT call and finalization could hang/segfault
        os._exit(0)
