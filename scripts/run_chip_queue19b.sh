#!/bin/bash
# Round-5 queue 19b: the memory-lean rel_flash_attention entry
# (residuals = original (B,T,H,Dh) tensors; augmentation rebuilt in
# the backward) after queue19's first bs256 attempt OOMed on saved
# q~/k~ (48 GB requested). Also fixes queue19's batch-size mismatch
# (M/L flash ran at the bench default bs64; controls are bs128).
set -u
LOG="${1:-bench_results/chip_queue19b.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 1800 python scripts/validate_flash_tpu.py
run 2400 BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=256 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=256 BENCH_FLASH=1 BENCH_MOMENTS=bfloat16 python scripts/bench_conformer.py
echo "QUEUE19B DONE" >> "$LOG"
