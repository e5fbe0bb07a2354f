#!/bin/bash
# Round-5 queue 19c: rel-pos flash after the CSE fix (optimization
# barrier in the backward rebuild — queue19b showed XLA CSE'ing the
# backward's recomputed q~/k~ against the forward's, keeping 17x2
# padded (B,H,T,640) tensors alive: L-bs128 flash OOM at ~11 GB of
# pads, L-bs256 at 48 GB). Controls: L bs128 XLA 294.9 utt/s;
# round-3 L bs256+remat XLA 220.1.
set -u
LOG="${1:-bench_results/chip_queue19c.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 2400 BENCH_SCALE=l BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=256 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=256 BENCH_FLASH=1 BENCH_REMAT=blocks python scripts/bench_conformer.py
echo "QUEUE19C DONE" >> "$LOG"
