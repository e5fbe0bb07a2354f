#!/bin/bash
# Round-4 queue: fused Conformer conv-module kernel (BENCH_FUSED=1,
# ops/conformer_pallas.py) vs the recorded XLA numbers (PARITY.md:
# M 417.9/593.0/643.9 utt/s at bs64/128/256 MFU 0.16; L bs128 275.5
# MFU 0.273), plus a same-day unfused bs128 control.
set -u
LOG="${1:-/tmp/chip_queue7.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run BENCH_FUSED=1 BENCH_BS=64 python scripts/bench_conformer.py
run BENCH_FUSED=1 BENCH_BS=128 python scripts/bench_conformer.py
run BENCH_FUSED=0 BENCH_BS=128 python scripts/bench_conformer.py
run BENCH_FUSED=1 BENCH_BS=256 python scripts/bench_conformer.py
run BENCH_FUSED=1 BENCH_SCALE=l BENCH_BS=128 python scripts/bench_conformer.py
echo "QUEUE7 DONE" >> "$LOG"
