#!/bin/bash
# Round-4 follow-up: clean re-run of bench_serving (the original run
# overlapped a stale queue instance on the chip) and bench_lm (fixed:
# sampled-softmax no longer materializes full-vocab logits).
set -u
LOG="${1:-/tmp/chip_queue6.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run python scripts/bench_serving.py
run python scripts/bench_lm.py
echo "QUEUE6 DONE" >> "$LOG"
