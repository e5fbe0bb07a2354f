#!/bin/bash
# Sequential real-chip measurement queue (one TPU chip — jobs must not
# overlap). Appends one JSON line per bench to the given log file.
set -u
LOG="${1:-/tmp/chip_queue.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

# Headline Jasper bench (driver-parity sanity run)
run python bench.py
# Conformer-L training: published large geometry, MXU-friendly d=512
run BENCH_SCALE=l BENCH_BS=32 python scripts/bench_conformer.py
run BENCH_SCALE=l BENCH_BS=64 python scripts/bench_conformer.py
# Transducer batch decode: greedy, then beam-4, then beam-4 + fusion
run BENCH_BS=64 python scripts/bench_transducer_decode.py
run BENCH_BS=64 BENCH_BEAM=4 python scripts/bench_transducer_decode.py
run BENCH_BS=64 BENCH_BEAM=4 BENCH_FUSION=1 python scripts/bench_transducer_decode.py
echo "QUEUE DONE" >> "$LOG"
