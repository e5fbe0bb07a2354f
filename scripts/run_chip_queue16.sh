#!/bin/bash
# Round-4 queue 16: Conformer-L operating-point probe past bs128 —
# round-3 ladder was 105.1/218.7/294.9 (MFU 0.293) at bs32/64/128 with
# bs256 OOM; bs160/192 may cross MFU 0.3 if memory allows (no remat
# first, remat fallback).
set -u
LOG="${1:-/tmp/chip_queue16.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 2400 BENCH_SCALE=l BENCH_BS=160 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=192 python scripts/bench_conformer.py
echo "QUEUE16 DONE" >> "$LOG"
