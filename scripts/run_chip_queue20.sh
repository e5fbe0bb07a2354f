#!/bin/bash
# Round-5 queue 20: NMT turnkey flagship proof (VERDICT r4 #4) — the
# transformer-big recipe VERBATIM (only step-count/cadence overrides,
# mirroring the Jasper turnkey's --num_epochs override) against the
# WMT-shaped synthetic corpus: train_eval -> eval BLEU -> beam infer ->
# score_bleu vs the held-out test references. Then the wordpiece +
# t2t-records leg: the transformer-big-t2t recipe training over the
# same corpus's TFRecord shards.
set -u
LOG="${1:-bench_results/chip_queue20.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

export WMT16_DIR=/tmp/synthwmt
export OS2S_LOGDIR=/tmp/tbig_log
rm -rf "$OS2S_LOGDIR"

run 600 python scripts/make_synth_wmt.py --out /tmp/synthwmt
run 7200 python run.py \
  --config_file=example_configs/text2text/transformer-big.py \
  --mode=train_eval --max_steps 4000 --eval_steps 2000 \
  --save_checkpoint_steps 2000 --print_loss_steps 200 \
  --print_samples_steps 2000
run 3600 python run.py \
  --config_file=example_configs/text2text/transformer-big.py \
  --mode=eval
run 3600 python run.py \
  --config_file=example_configs/text2text/transformer-big.py \
  --mode=infer --infer_output_file=/tmp/tbig_test_out.txt
run 300 python scripts/score_bleu.py /tmp/tbig_test_out.txt \
  /tmp/synthwmt/wmt14-en-de.ref.BPE_common.32K.tok
cp /tmp/tbig_test_out.txt bench_results/ 2>/dev/null || true

# wordpiece + t2t records leg (train only; the data path is the point)
run 3600 OS2S_LOGDIR=/tmp/tbig_t2t_log python run.py \
  --config_file=example_configs/text2text/transformer-big-t2t.py \
  --mode=train --max_steps 600 --print_loss_steps 100 \
  --save_checkpoint_steps 600
echo "QUEUE20 DONE" >> "$LOG"
