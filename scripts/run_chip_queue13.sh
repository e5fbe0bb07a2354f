#!/bin/bash
# Round-4 queue 13: (a) finish the interrupted queue11 turnkey flagship
# run (infer stage from the surviving /tmp/jasper_synth_log
# checkpoints); (b) run queue12's two probes — int8 serving at a
# matmul-bound size (d1024/T256) and Conformer-M bs128 with
# attention-weight dropout off (quantify the (B,H,T,T) mask cost left
# after the rel-shift fix; 729.4 utt/s control).
set -u
LOG="${1:-/tmp/chip_queue13.log}"
cd "$(dirname "$0")/.."
export LIBRISPEECH_DIR=/tmp/synthls
export OS2S_LOGDIR=/tmp/jasper_synth_log

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 2400 python run.py \
    --config_file=example_configs/speech2text/jasper10x5_LibriSpeech.py \
    --mode=infer --infer_output_file=/tmp/jasper_synth_infer.csv
run 2400 BENCH_SERVE_DMODEL=1024 BENCH_SERVE_SEQ=256 BENCH_SERVE_BS=64 \
    python scripts/bench_serving.py
run 2400 BENCH_BS=128 BENCH_ATTN_KEEP=1.0 python scripts/bench_conformer.py
echo "QUEUE13 DONE" >> "$LOG"
