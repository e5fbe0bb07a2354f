#!/bin/bash
# Round-4 queue 15: (a) third attempt at the matmul-bound int8 serving
# point, now with relay-drop retry in the bench (two prior runs died to
# transient remote-compile broken pipes); (b) on-device CTC beam decode
# bench after the emission-frame timestamp buffer was added — confirm
# the extra (K,U) carry did not regress the 32.5 utt/s round-3 figure.
set -u
LOG="${1:-/tmp/chip_queue15.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 3600 BENCH_SERVE_DMODEL=1024 BENCH_SERVE_SEQ=256 BENCH_SERVE_BS=64 \
    python scripts/bench_serving.py
run 2400 python scripts/bench_ctc_beam_tpu.py
echo "QUEUE15 DONE" >> "$LOG"
