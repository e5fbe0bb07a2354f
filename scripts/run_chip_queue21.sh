#!/bin/bash
# Round-5 queue 21: the low-MFU-tail record + the dropout-apply fix.
# (a) NMT T=256 dropout-on with the round-5 self-residualizing
#     relu+dropout (parts/dropout.relu_dropout): VERDICT r4 #6 target
#     MFU >= 0.52 (round-4 reading 0.479 on / 0.567 off);
# (b) LSTM-LM breakdown probe (embedding gather / scan / sequential-
#     matmul floor / sampled softmax) — the 0.147-MFU bound record;
# (c) Tacotron reduction-factor sweep r=1/2/4 — the 0.036-MFU
#     autoregressive-scan bound attacked by shortening the scan.
set -u
LOG="${1:-bench_results/chip_queue21.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

# flash re-probes after the dk-cut + bf16-chain kernel improvements
# (queue19's numbers predate both), plus the L flash retry at the
# recipe's bs64 and at bs128 (queue19c bs128 OOM was the f32 chain)
run 1800 BENCH_BS=64 BENCH_T=500 python scripts/probe_conformer_breakdown.py
run 1800 BENCH_BS=32 BENCH_T=1000 python scripts/probe_conformer_breakdown.py
run 2400 BENCH_SCALE=l BENCH_BS=64 BENCH_FLASH=1 python scripts/bench_conformer.py
run 2400 BENCH_SCALE=l BENCH_BS=128 BENCH_FLASH=1 python scripts/bench_conformer.py

run 2400 BENCH_NMT_SEQ=256 BENCH_NMT_BS=16 BENCH_NMT_PADFRAC=0.1 python bench_nmt.py
run 2400 BENCH_NMT_SEQ=256 BENCH_NMT_BS=16 BENCH_NMT_PADFRAC=0.1 BENCH_NMT_NODROP=1 python bench_nmt.py
run 2400 python scripts/probe_lm_breakdown.py
run 1800 python scripts/bench_tacotron.py
run 1800 BENCH_R=2 python scripts/bench_tacotron.py
run 1800 BENCH_R=4 python scripts/bench_tacotron.py
echo "QUEUE21 DONE" >> "$LOG"
