#!/bin/bash
# Round-4 queue (take 2, after the SMEM blockspec fix): fused Conformer
# conv-module kernel vs recorded XLA numbers (M 597.9 utt/s bs128 MFU
# 0.137 same-day control; L bs128 275.5 MFU 0.273 r3), and the fused
# dropout(+residual) kernels on transformer-big at the ROADMAP's T=256
# dropout-gap operating point (127.3k tok/s MFU 0.479 on, 150.9k 0.567
# off).
set -u
LOG="${1:-/tmp/chip_queue8.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run BENCH_FUSED=1 BENCH_BS=64 python scripts/bench_conformer.py
run BENCH_FUSED=1 BENCH_BS=128 python scripts/bench_conformer.py
run BENCH_FUSED=1 BENCH_BS=256 python scripts/bench_conformer.py
run BENCH_FUSED=1 BENCH_SCALE=l BENCH_BS=128 python scripts/bench_conformer.py
run BENCH_NMT_FUSEDDROP=1 BENCH_NMT_SEQ=256 BENCH_NMT_BS=16 BENCH_NMT_PADFRAC=0.1 python bench_nmt.py
run BENCH_NMT_FUSEDDROP=0 BENCH_NMT_SEQ=256 BENCH_NMT_BS=16 BENCH_NMT_PADFRAC=0.1 python bench_nmt.py
echo "QUEUE8 DONE" >> "$LOG"
