#!/usr/bin/env python
"""Per-op profile of the transformer-big beam-4 decode step.

Builds the SAME jitted program as ``scripts/bench_nmt_decode.py``
(via ``build_decode_step``), traces one execution with jax.profiler,
then parses the trace protobuf-JSON and prints the top HLO ops by
total device time, grouped by a coarse category (gather, dus =
dynamic-update-slice, fusion, dot, sort, copy/transpose, ...).

This is how the round-2 decode findings were produced (beam top-k
full-sort 11.8 ms/step; per-layer KV dus+gather 10.4 of 25 ms) —
kept as a script so the measurement is reproducible.

Usage: [BENCH_BS=64] [BENCH_LAZY=0] python scripts/profile_decode.py
Output: one JSON line per category + top-20 op table on stderr.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def categorize(name: str) -> str:
    n = name.lower()
    for key, cat in (
            ("gather", "gather"),
            ("dynamic-update-slice", "dus"),
            ("dynamic_update_slice", "dus"),
            ("scatter", "dus"),
            ("sort", "sort"),
            ("top-k", "sort"),
            ("convert", "convert"),
            ("transpose", "copy/transpose"),
            ("copy", "copy/transpose"),
            ("dot", "dot"),
            ("conv", "dot"),
            ("fusion", "fusion"),
            ("reduce", "reduce"),
            ("broadcast", "broadcast"),
            ("iota", "misc"),
            ("select", "misc"),
    ):
        if key in n:
            return cat
    return "misc"


def parse_trace(trace_dir: str):
    """Sum device-lane "X" event durations by op name.

    The jax profiler writes <dir>/plugins/profile/<ts>/*.trace.json.gz
    (chrome trace format). Device lanes are the pids whose process
    names mention the device; to stay robust over relay quirks we sum
    every complete event that carries a duration and drop obvious
    host-side lanes (python, thread pool) by name.
    """
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    per_op = collections.Counter()
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # map pid -> process name to exclude host lanes
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev.get("pid")] = ev.get("args", {}).get("name", "")
    def is_device(pid):
        name = pid_name.get(pid, "").lower()
        if not name:
            return True
        return not any(h in name for h in ("python", "host", "plugin",
                                           "framework", "steps"))
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if not is_device(ev.get("pid")):
            continue
        per_op[ev.get("name", "?")] += ev["dur"]
    return per_op


def main():
    import jax
    import numpy as np
    from bench_nmt_decode import build_decode_step

    bs = int(os.environ.get("BENCH_BS", "64"))
    lazy = os.environ.get("BENCH_LAZY", "0") == "1"
    step, state, device_batch = build_decode_step(bs, lazy)

    out = step(state, device_batch)           # compile + warm
    np.asarray(jax.tree.leaves(jax.device_get(out))[0])

    trace_dir = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="decode_trace_")
    jax.profiler.start_trace(trace_dir)
    out = step(state, device_batch)
    jax.device_get(jax.tree.leaves(out)[0])
    jax.profiler.stop_trace()

    per_op = parse_trace(trace_dir)
    per_cat = collections.Counter()
    for name, dur in per_op.items():
        per_cat[categorize(name)] += dur
    total = sum(per_cat.values())
    print(json.dumps({
        "metric": "decode_step_device_time_by_category_ms",
        "lazy_decode": lazy,
        "total_ms": round(total / 1e3, 2),
        "categories_ms": {k: round(v / 1e3, 2)
                          for k, v in per_cat.most_common()},
        "trace_dir": trace_dir,
    }))
    print("top 25 ops by total device time:", file=sys.stderr)
    for name, dur in per_op.most_common(25):
        print(f"  {dur/1e3:9.2f} ms  {name[:110]}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
