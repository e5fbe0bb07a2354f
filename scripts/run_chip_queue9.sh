#!/bin/bash
# Round-4 queue: Conformer after the rel-shift attention fix (controls:
# M bs128 597.9 / bs256 643.9 / L bs128 275.5 utt/s), the piece probe
# re-run, and the 10k-step fp16+Backoff stability run (VERDICT #2).
set -u
LOG="${1:-/tmp/chip_queue9.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 2400 BENCH_BS=128 python scripts/bench_conformer.py
run 2400 BENCH_BS=256 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=128 python scripts/bench_conformer.py
run 2400 python scripts/probe_conformer_breakdown.py
run 5400 python scripts/stability_run.py
echo "QUEUE9 DONE" >> "$LOG"
