"""Parse a jax.profiler Chrome trace: self-time aggregation + event args.

Usage: python benchmarks/parse_trace.py [trace_dir] [--args NAME]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict


def load(trace_dir):
    traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1], "rt") as f:
        return json.load(f)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mm_profile"
    data = load(trace_dir)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in data.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n}

    if "--args" in sys.argv:
        name = sys.argv[sys.argv.index("--args") + 1]
        seen = 0
        for e in events:
            if e.get("pid") in dev_pids and name in e.get("name", ""):
                print(json.dumps(e, indent=1)[:2000])
                seen += 1
                if seen >= 2:
                    break
        return

    # self-time: per (pid,tid), sort by start; nested intervals subtract
    by_track = defaultdict(list)
    for e in events:
        if e.get("pid") in dev_pids:
            by_track[(e["pid"], e.get("tid"))].append(e)

    self_ms = defaultdict(float)
    cnt = defaultdict(int)
    total_leaf = 0.0
    for track, evs in by_track.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []
        child_time = defaultdict(float)  # id(event) -> child dur
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1]["ts"] + stack[-1].get("dur", 0):
                stack.pop()
            if stack:
                child_time[id(stack[-1])] += dur
            stack.append(e)
        for e in evs:
            self_t = (e.get("dur", 0) - child_time.get(id(e), 0)) / 1e3
            if self_t <= 0:
                continue
            self_ms[e["name"]] += self_t
            cnt[e["name"]] += 1
            total_leaf += self_t

    print(f"total self time: {total_leaf:.1f} ms")
    print(f"{'ms':>10} {'%':>6} {'n':>6}  op")
    shown = 0.0
    for name, ms in sorted(self_ms.items(), key=lambda kv: -kv[1])[:50]:
        print(f"{ms:10.2f} {100*ms/total_leaf:6.1f} {cnt[name]:6d}  {name[:110]}")
        shown += ms
    print(f"(top-50 covers {100*shown/total_leaf:.0f}%)")


if __name__ == "__main__":
    main()
