#!/bin/bash
# Round-5 queue 21c: L bs128 flash after compact residual layouts
# (queue21b margin was 75.78 MB; the padded lse residuals alone were
# ~2.3 GB), plus the bs256 flash+remat retry with the same fix.
set -u
LOG="${1:-bench_results/chip_queue21c.log}"
cd "$(dirname "$0")/.."
run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}
run 2400 BENCH_SCALE=l BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=256 BENCH_FLASH=1 BENCH_REMAT=blocks python scripts/bench_conformer.py
echo "QUEUE21C DONE" >> "$LOG"
