#!/bin/bash
# Round-5 queue 21b: (a) isolate the NMT attention-weight-dropout term
# (queue21: dropout-on 0.486 MFU vs off 0.569); (b) Conformer-L bs128
# flash retry after the single-lane lse fix (queue21 OOM margin was
# 75.78 MB; the 8-lane lse layout alone was ~125 MB).
set -u
LOG="${1:-bench_results/chip_queue21b.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 2400 BENCH_NMT_SEQ=256 BENCH_NMT_BS=16 BENCH_NMT_PADFRAC=0.1 BENCH_NMT_NOATTNDROP=1 python bench_nmt.py
run 2400 BENCH_SCALE=l BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=128 BENCH_FLASH=1 BENCH_MOMENTS=bfloat16 python scripts/bench_conformer.py
echo "QUEUE21B DONE" >> "$LOG"
