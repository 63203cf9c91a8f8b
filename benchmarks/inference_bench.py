"""Serving/inference throughput: embedding-export on the flagship towers.

Training is the headline bench (bench.py), but the production *serving*
workload of a contrastive framework is forward-only encoding — building
retrieval indexes, zero-shot classification, online similarity scoring.
The reference runs this path through Lightning's ``trainer.test`` with the
same eager torch modules it trains with (reference mmlearn/cli/run.py:145-146);
here it is one jitted, deterministic ``task.encode`` per tower.

Forward-only changes the perf calculus measured in training:

- no remat recompute (remat only affects the backward);
- no optimizer/donated-state plumbing;
- int8-forward quantization (``MMLEARN_QUANT=int8_fwd``) no longer pays the
  backward-side STE/recompute costs that made it a net loss for training
  (docs/performance.md) — this probe measures whether it wins here;
- batch size can grow past the training HBM envelope (no activation stash).

Usage: ``python benchmarks/inference_bench.py [--modes bf16,int8_fwd]
[--batches 256,512,1024]``. Prints one table + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

os.environ.setdefault("MMLEARN_ATTN_LOGITS", "bf16")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmlearn_tpu._platform import force_platform_from_env

force_platform_from_env()

from __graft_entry__ import _flagship_task, _synthetic_batch


def _bench_callable(fn, args, n_steps=10, n_windows=3):
    """Median steady-state calls/sec; float() fence (tunneled PJRT)."""
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    for _ in range(3):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    windows = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
        windows.append(n_steps / (time.perf_counter() - t0))
    return statistics.median(windows)


def run_mode(
    mode: str, batches: list[int], tiny: bool = False,
    param_dtype: str = "float32",
) -> dict:
    """Build fresh jitted encoders under ``MMLEARN_QUANT=mode`` and measure.

    ``quant_mode()`` is a trace-time env read, so each mode gets its own
    ``jax.jit`` wrappers (separate trace caches) with the env set before the
    first trace.
    """
    if mode == "bf16":
        os.environ.pop("MMLEARN_QUANT", None)
    else:
        os.environ["MMLEARN_QUANT"] = mode

    shapes = (32, 16, 64) if tiny else (224, 77, 49408)
    task = _flagship_task(tiny=tiny)
    init_batch = _synthetic_batch(8, *shapes, dtype=jnp.bfloat16)
    params = task.init_params(jax.random.key(0), init_batch)
    if param_dtype != "float32":
        # serving-side weight cast: halves weight HBM reads — matters when
        # small online batches leave the towers bandwidth-bound
        dt = jnp.dtype(param_dtype)
        params = jax.tree.map(
            lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    @jax.jit
    def encode_image(params, batch):
        return task.encode(params, batch, "rgb", normalize=True)

    @jax.jit
    def encode_text(params, batch):
        return task.encode(params, batch, "text", normalize=True)

    results = {}
    for bsz in batches:
        batch = _synthetic_batch(bsz, *shapes, dtype=jnp.bfloat16)
        try:
            img_rate = _bench_callable(
                encode_image, (params, {"rgb": batch["rgb"]})
            )
            txt_rate = _bench_callable(
                encode_text, (params, {"text": batch["text"]})
            )
        except Exception as err:  # noqa: BLE001 - record OOM/compile failures
            results[bsz] = {"error": f"{type(err).__name__}: {err}"[:200]}
            continue
        results[bsz] = {
            "images_per_sec": round(img_rate * bsz, 1),
            "texts_per_sec": round(txt_rate * bsz, 1),
        }
    # leave the env clean for the next mode
    os.environ.pop("MMLEARN_QUANT", None)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="bf16,int8_fwd")
    default_batches = "256,1024" if jax.default_backend() == "tpu" else "8"
    ap.add_argument("--batches", default=default_batches)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny towers (CPU smoke test of the harness)")
    ap.add_argument("--param-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    batches = [int(b) for b in args.batches.split(",")]

    all_results = {}
    for mode in modes:
        all_results[mode] = run_mode(
            mode, batches, tiny=args.tiny, param_dtype=args.param_dtype
        )
        for bsz, r in all_results[mode].items():
            print(f"{mode:>9} b{bsz:<5} {r}", flush=True)

    print(json.dumps({
        "metric": "clip_vitb16_inference_throughput",
        "backend": jax.default_backend(),
        "param_dtype": args.param_dtype,
        "results": all_results,
    }))


if __name__ == "__main__":
    main()
