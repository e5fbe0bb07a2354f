#!/bin/bash
# Round-4 turnkey-readiness run: the flagship Jasper recipe VERBATIM
# (example_configs/speech2text/jasper10x5_LibriSpeech.py) end-to-end on
# chip against the LibriSpeech-shaped synthetic corpus
# (scripts/make_synth_corpus.py) — train_eval to ~0 WER, then eval and
# infer from the produced checkpoints. Validates recipe mechanics
# (auto decay_steps, masks, feature cache, best-checkpoint, eval
# clipping, CSV contract) with zero dataset egress.
set -u
LOG="${1:-/tmp/chip_queue11.log}"
cd "$(dirname "$0")/.."
export LIBRISPEECH_DIR=/tmp/synthls
export OS2S_LOGDIR=/tmp/jasper_synth_log
rm -rf "$OS2S_LOGDIR"

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 300 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/make_synth_corpus.py --out /tmp/synthls
run 4800 python run.py \
    --config_file=example_configs/speech2text/jasper10x5_LibriSpeech.py \
    --mode=train_eval --num_epochs 40 --eval_steps 120 \
    --save_checkpoint_steps 120 --print_loss_steps 10
run 2400 python run.py \
    --config_file=example_configs/speech2text/jasper10x5_LibriSpeech.py \
    --mode=eval
run 2400 python run.py \
    --config_file=example_configs/speech2text/jasper10x5_LibriSpeech.py \
    --mode=infer --infer_output_file=/tmp/jasper_synth_infer.csv
echo "QUEUE11 DONE" >> "$LOG"
