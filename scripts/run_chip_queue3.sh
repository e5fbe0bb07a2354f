#!/bin/bash
# Third sequential real-chip queue: Conformer-L batch scaling + the
# on-device CTC beam decode benches.
set -u
LOG="${1:-/tmp/chip_queue3.log}"
cd "$(dirname "$0")/.."

run() {
  echo "== $*" >> "$LOG"
  timeout 2400 env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

# re-run transducer decode with the device_get fence (block_until_ready
# returned early over the relay — first numbers were bogus)
run BENCH_BS=64 python scripts/bench_transducer_decode.py
run BENCH_BS=64 BENCH_BEAM=4 python scripts/bench_transducer_decode.py
run BENCH_SCALE=l BENCH_BS=128 python scripts/bench_conformer.py
run BENCH_SCALE=l BENCH_BS=256 BENCH_REMAT=blocks python scripts/bench_conformer.py
run BENCH_BS=64 BENCH_BEAM=16 BENCH_HOST=1 python scripts/bench_ctc_beam_tpu.py
run BENCH_BS=64 BENCH_BEAM=16 BENCH_FUSION=1 python scripts/bench_ctc_beam_tpu.py
echo "QUEUE3 DONE" >> "$LOG"
