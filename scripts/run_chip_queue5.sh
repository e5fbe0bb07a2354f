#!/bin/bash
# Round-4 evidence queue: one measured v5e number for EVERY bench
# script (VERDICT r3 next-step #1), plus the queued Conformer-L
# saturation points (bs128 / bs256 / bs256+remat).
set -u
LOG="${1:-/tmp/chip_queue5.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run python scripts/bench_serving.py
run python scripts/bench_resnet.py
run BENCH_BS=256 python scripts/bench_resnet.py
run python scripts/bench_lm.py
run python scripts/bench_tacotron.py
run python scripts/bench_transducer_decode.py
run BENCH_BEAM=4 python scripts/bench_transducer_decode.py
run BENCH_SCALE=l BENCH_BS=128 python scripts/bench_conformer.py
run BENCH_SCALE=l BENCH_BS=256 python scripts/bench_conformer.py
run BENCH_SCALE=l BENCH_BS=256 BENCH_REMAT=blocks python scripts/bench_conformer.py
run BENCH_BS=128 BENCH_BEAM=16 python scripts/bench_ctc_beam_tpu.py
echo "QUEUE5 DONE" >> "$LOG"
