#!/usr/bin/env bash
# Round bench battery: run every TPU measurement serially on an idle host,
# appending one JSON line per bench to $OUT (default /tmp/bench_battery.jsonl).
# Tolerates individual failures; requires the axon TPU tunnel to be up.
set -u -o pipefail
OUT="${OUT:-/tmp/bench_battery.jsonl}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >&2
  local line rc
  line=$(timeout "${STEP_TIMEOUT:-1500}" "$@" 2> >(tail -5 >&2) | tail -1)
  rc=$?
  # record only clean JSON from successful runs — consumers json.loads per line
  if [ $rc -eq 0 ] && printf '%s' "$line" | python -c "import json,sys; json.load(sys.stdin)" 2>/dev/null; then
    printf '%s\n' "$line" | tee -a "$OUT"
  else
    echo "FAILED (rc=$rc): $*" >&2
    printf '{"bench_failed": "%s", "rc": %d}\n' "$1 ${2:-}" "$rc" >> "$OUT"
  fi
}

date -u +'{"battery_start": "%Y-%m-%dT%H:%M:%SZ"}' >> "$OUT"

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

date -u +'{"battery_end": "%Y-%m-%dT%H:%M:%SZ"}' >> "$OUT"
echo "battery done; results in $OUT" >&2
