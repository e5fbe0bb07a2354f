#!/bin/bash
# Round-4 queue 17: measure the flash rel-pos attention path —
# (a) piece probe (rel_pos_attention vs rel_pos_attention_flash, same
# dims as queue14's 4.78 ms XLA reading); (b) end-to-end Conformer-M
# bs128 with BENCH_FLASH=1 vs the 729.4 utt/s control; (c) same for
# Conformer-L bs128 (294.9 control).
set -u
LOG="${1:-/tmp/chip_queue17.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 2400 python scripts/probe_conformer_breakdown.py
run 2400 BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py
echo "QUEUE17 DONE" >> "$LOG"
