#!/bin/bash
# Fourth sequential real-chip queue: serving throughput + wider
# on-device CTC beam decode.
set -u
LOG="${1:-/tmp/chip_queue4.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run python scripts/bench_serving.py
run BENCH_BS=128 BENCH_BEAM=16 python scripts/bench_ctc_beam_tpu.py
run BENCH_BS=64 BENCH_BEAM=32 python scripts/bench_ctc_beam_tpu.py
echo "QUEUE4 DONE" >> "$LOG"
