#!/usr/bin/env bash
# Round bench battery: run every TPU measurement serially on an idle host,
# appending one JSON line per bench to $OUT (default /tmp/bench_battery.jsonl).
# Tolerates individual failures; requires the axon TPU tunnel to be up.
set -u
OUT="${OUT:-/tmp/bench_battery.jsonl}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >&2
  timeout "${STEP_TIMEOUT:-1500}" "$@" 2> >(tail -5 >&2) | tail -1 | tee -a "$OUT"
}

date -u +"# battery start %Y-%m-%dT%H:%M:%SZ" >> "$OUT"

# 1. headline: full train step (synthetic + input-fed)
run python bench.py

# 2. serving: forward-only encode throughput, bf16 vs int8 modes
run python benchmarks/inference_bench.py --modes bf16,int8_fwd --batches 256,1024
# small-batch online serving: bf16 weights halve the bandwidth-bound read
run python benchmarks/inference_bench.py --modes bf16 --batches 32 --param-dtype bfloat16
run python benchmarks/inference_bench.py --modes bf16 --batches 32

# 3. serving: index query throughput (1M x 512 flat inner-product)
run python benchmarks/index_query_bench.py

# 4. I-JEPA train step (current number of record: 707 img/s @ b256)
run python benchmarks/ijepa_train_step.py 256

date -u +"# battery end %Y-%m-%dT%H:%M:%SZ" >> "$OUT"
echo "battery done; results in $OUT" >&2
