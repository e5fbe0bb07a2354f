#!/bin/bash
# Round-5 queue 25: fused-RNN hardware validation + re-bench after the
# sequential-grid fix (queue24 caught the LM NaN; queue22/23 numbers
# need re-deriving on correct math).
set -u
LOG="${1:-bench_results/chip_queue25.log}"
cd "$(dirname "$0")/.."
run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}
run 2400 python scripts/validate_fused_rnn_tpu.py
run 2400 BENCH_CHAIN=20 BENCH_STEPS=3 python scripts/bench_lm.py
run 2400 BENCH_CHAIN=20 BENCH_STEPS=3 python scripts/bench_ds2.py
echo "QUEUE25 DONE" >> "$LOG"
