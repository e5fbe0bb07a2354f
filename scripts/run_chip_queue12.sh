#!/bin/bash
# Round-4 queue: (a) int8 serving at a matmul-bound size (d1024/T256 —
# the d512/T64 point measured only 1.10x because it is HBM/VPU-bound);
# (b) Conformer-M bs128 with attention-weight dropout off, to quantify
# the (B,H,T,T) mask cost left after the rel-shift fix (729.4 control).
set -u
LOG="${1:-/tmp/chip_queue12.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run BENCH_SERVE_DMODEL=1024 BENCH_SERVE_SEQ=256 BENCH_SERVE_BS=64 python scripts/bench_serving.py
run BENCH_BS=128 BENCH_ATTN_KEEP=1.0 python scripts/bench_conformer.py
echo "QUEUE12 DONE" >> "$LOG"
