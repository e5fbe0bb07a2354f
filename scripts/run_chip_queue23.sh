#!/bin/bash
# Round-5 queue 23: DS2-medium throughput, lax.scan control vs the
# fused Pallas GRU scan (ops/gru_pallas.py).
set -u
LOG="${1:-bench_results/chip_queue23.log}"
cd "$(dirname "$0")/.."
run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}
run 2400 BENCH_FUSED_RNN=0 python scripts/bench_ds2.py
run 2400 BENCH_FUSED_RNN=1 python scripts/bench_ds2.py
echo "QUEUE23 DONE" >> "$LOG"
