#!/bin/bash
# Round-5 queue 26: clean LM A/B at the default 30-step window WITH
# the finite-loss assert active (the queue22 numbers predate it).
set -u
LOG="${1:-bench_results/chip_queue26.log}"
cd "$(dirname "$0")/.."
run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}
run 2400 BENCH_FUSED_RNN=0 python scripts/bench_lm.py
run 2400 BENCH_FUSED_RNN=1 python scripts/bench_lm.py
echo "QUEUE26 DONE" >> "$LOG"
