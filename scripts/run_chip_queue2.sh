#!/bin/bash
# Second sequential real-chip queue: on-device CTC beam decode.
set -u
LOG="${1:-/tmp/chip_queue2.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run BENCH_BS=64 BENCH_BEAM=16 BENCH_HOST=1 python scripts/bench_ctc_beam_tpu.py
run BENCH_BS=64 BENCH_BEAM=16 BENCH_FUSION=1 python scripts/bench_ctc_beam_tpu.py
run BENCH_BS=128 BENCH_BEAM=16 python scripts/bench_ctc_beam_tpu.py
echo "QUEUE2 DONE" >> "$LOG"
