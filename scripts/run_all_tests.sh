#!/usr/bin/env bash
# Full test sweep (reference scripts/run_all_tests.sh): unit + toy
# end-to-end. CPU-forced with a virtual 8-device mesh so SPMD tests run
# without TPU hardware.
set -e
cd "$(dirname "$0")/.."

export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

echo "== unit + convergence suite =="
python -m pytest tests/ -q

echo "== toy end-to-end configs =="
TOY_LOG=$(mktemp -d)
OS2S_TOY_LOGDIR="$TOY_LOG/asr" python run.py \
    --config_file=example_configs/speech2text/w2lplus_toy.py \
    --mode=train_eval --num_epochs 60 --eval_steps 30
OS2S_TOY_LOGDIR="$TOY_LOG/asr_ondevice" python run.py \
    --config_file=example_configs/speech2text/w2lplus_toy_ondevice.py \
    --mode=train_eval --num_epochs 60 --eval_steps 30
OS2S_TOY_LOGDIR="$TOY_LOG/ds2" python run.py \
    --config_file=example_configs/speech2text/ds2_toy_config.py \
    --mode=train --num_epochs 20
OS2S_TOY_NMT_LOGDIR="$TOY_LOG/nmt" python run.py \
    --config_file=example_configs/text2text/nmt_reversal_toy.py \
    --mode=train --num_epochs 10
OS2S_TOY_NMT_LOGDIR="$TOY_LOG/nmt_rnn" python run.py \
    --config_file=example_configs/text2text/nmt_reversal_toy_rnn.py \
    --mode=train --num_epochs 10
OS2S_TOY_NMT_LOGDIR="$TOY_LOG/nmt_cc" python run.py \
    --config_file=example_configs/text2text/nmt_reversal_toy_convs2s.py \
    --mode=train --num_epochs 10
OS2S_TOY_LOGDIR="$TOY_LOG/tts" python run.py \
    --config_file=example_configs/text2speech/tacotron_toy.py \
    --mode=train_eval

echo "== multichip dryrun (8 virtual devices) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py
echo "ALL TESTS PASSED"
