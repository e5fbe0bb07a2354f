#!/bin/bash
# Round-5 queue 19: the separable-fold flash rel-pos kernel
# (ops/flash_relpos.py) vs the XLA path — the round-4 ab-bias kernel
# lost everywhere because it materialized the (B,H,T,T) bias in HBM
# (bench_results/chip_queue18.log: T=1000 piece probe 22.4 ms flash vs
# 18.0 XLA; Conformer-L bs256+flash HBM-OOM on the bias pads). The new
# kernel materializes nothing quadratic in T. Measure:
# (a) piece probes at the bench shape (T=250 bs128) and long T
#     (500/1000) — the probe emits both rel_pos_attention (XLA) and
#     rel_pos_attention_flash (now the separable kernel);
# (b) Conformer-M bs128 end-to-end with flash (control 729.4 utt/s);
# (c) Conformer-L bs128 (control 294.9, MFU 0.293) and the bs256
#     unlock probe that OOMed for round 3 (no recorded GiB numbers)
#     and for the round-4 ab kernel (queue18).
set -u
LOG="${1:-bench_results/chip_queue19.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 1800 BENCH_BS=128 BENCH_T=250 python scripts/probe_conformer_breakdown.py
run 1800 BENCH_BS=64 BENCH_T=500 python scripts/probe_conformer_breakdown.py
run 1800 BENCH_BS=32 BENCH_T=1000 python scripts/probe_conformer_breakdown.py
run 2400 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=256 BENCH_FLASH=1 python scripts/bench_conformer.py
echo "QUEUE19 DONE" >> "$LOG"
