"""Profile the flagship CLIP train step and print an op-level breakdown.

Captures a jax.profiler trace of 3 steps, then parses the Chrome-trace JSON
to aggregate device op durations by fusion/op name.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _flagship_task, _synthetic_batch  # noqa: E402

TRACE_DIR = os.environ.get("MMLEARN_TRACE_DIR", "/tmp/mm_profile")


def build_step(batch_size=256):
    task = _flagship_task(tiny=False)
    batch = _synthetic_batch(batch_size, 224, 77, 49408, dtype=jnp.bfloat16)
    params = task.init_params(jax.random.key(0), batch)
    tx = task.configure_optimizers(max_steps=10_000)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_wrap(p):
            loss, _ = task.loss_fn(p, batch, rng, {}, deterministic=False)
            return loss

        loss, grads = jax.value_and_grad(loss_wrap)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    return train_step, params, opt_state, batch


def main():
    bs = int(os.environ.get("MMLEARN_PROFILE_BATCH", "256"))
    step, params, opt_state, batch = build_step(bs)
    rng = jax.random.key(1)

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, batch, rng)
    print(f"compile+first step: {time.perf_counter()-t0:.1f} s", flush=True)
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    float(loss)
    dt = (time.perf_counter() - t0) / 5
    print(f"steady step: {dt*1e3:.1f} ms -> {bs/dt:.0f} pairs/s", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, batch, rng)
        float(loss)

    traces = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        print("no trace written")
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # device events live on pids whose names mention TPU/device
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in data.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "device" in n.lower() or "/device" in n
    }
    print("process names:", dict(list(pid_names.items())[:10]))

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"\ntotal device time over 3 steps: {total:.1f} ms")
    print(f"{'ms':>10} {'%':>6} {'n':>5}  op")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms:10.2f} {100*ms/max(total,1e-9):6.1f} {cnt[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
