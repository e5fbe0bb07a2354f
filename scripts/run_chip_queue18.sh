#!/bin/bash
# Round-4 queue 18: where does flash rel-pos pay?
# Queue17's T=250 piece probe showed flash LOSES at the bench shape
# (6.98 ms vs 4.77 XLA) — the crossover should be at long T where the
# materialized (B,H,T,T) rel-score tensor dominates. Measure:
# (a) piece probe at T=1000 (long-form ASR, 40s utts post-subsample)
#     and T=500, bs32 to keep the score tensor in range;
# (b) Conformer-L bs256 + flash — round 3's OOM point (19.53 GiB vs
#     15.75): flash never materializes the scores, may unlock bs256
#     without remat and beat the bs128 294.9 utt/s operating point.
set -u
LOG="${1:-/tmp/chip_queue18.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 1800 BENCH_BS=32 BENCH_T=1000 python scripts/probe_conformer_breakdown.py
run 1800 BENCH_BS=64 BENCH_T=500 python scripts/probe_conformer_breakdown.py
run 2400 BENCH_SCALE=l BENCH_BS=256 BENCH_FLASH=1 python scripts/bench_conformer.py
echo "QUEUE18 DONE" >> "$LOG"
