#!/bin/bash
# Round-5 queue 22: measure the fused Pallas LSTM scan (queue21's
# recorded lever — lax.scan stack 30.9 ms fwd+bwd vs 12.1 ms
# sequential-matmul floor). Control first, then fused, at the
# bench_lm flagship shapes (bs224, bptt 96, 268k vocab).
set -u
LOG="${1:-bench_results/chip_queue22.log}"
cd "$(dirname "$0")/.."
run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}
run 2400 python scripts/bench_lm.py
run 2400 BENCH_FUSED_RNN=1 python scripts/bench_lm.py
echo "QUEUE22 DONE" >> "$LOG"
