#!/bin/bash
# Round-4 queue: headline regression check after this round's changes
# (Jasper 168.5 utt/s, NMT 145.3k tok/s T=64 controls) + the ResNet
# per-op profile (MFU 0.370 at bs128 — where does the non-conv time
# go?).
set -u
LOG="${1:-/tmp/chip_queue10.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run BENCH_E2E=0 python bench.py
run python bench_nmt.py
run BENCH_BS=128 python scripts/profile_resnet.py
echo "QUEUE10 DONE" >> "$LOG"
