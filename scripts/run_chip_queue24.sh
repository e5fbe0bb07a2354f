#!/bin/bash
# Round-5 queue 24: training-sanity for the fused RNN kernels at
# recipe scale ON HARDWARE — the bench harness now asserts finite
# loss, but a short real descent is stronger: rerun both benches
# (post finite-loss assert) with more chained steps so a silent
# divergence would trip the assert, then stability: 60 steps each.
set -u
LOG="${1:-bench_results/chip_queue24.log}"
cd "$(dirname "$0")/.."
run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}
run 2400 BENCH_CHAIN=20 BENCH_STEPS=3 python scripts/bench_lm.py
run 2400 BENCH_CHAIN=20 BENCH_STEPS=3 python scripts/bench_ds2.py
echo "QUEUE24 DONE" >> "$LOG"
