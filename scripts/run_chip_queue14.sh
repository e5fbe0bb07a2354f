#!/bin/bash
# Round-4 queue 14: round-end confirmations — (a) the headline bench
# reproduces after this round's changes (the driver records bench.py at
# the round boundary; fail here, fix here); (b) the NMT bench; (c) the
# post-rel-shift Conformer block breakdown, to document where the
# remaining M-scale time goes now that the position gather is fixed.
set -u
LOG="${1:-/tmp/chip_queue14.log}"
cd "$(dirname "$0")/.."

run() {
  local t="$1"; shift
  echo "== $*" >> "$LOG"
  timeout "$t" env "$@" >> "$LOG" 2>&1
  echo "== exit $? : $*" >> "$LOG"
}

run 3600 python bench.py
run 2400 python bench_nmt.py
run 2400 python scripts/probe_conformer_breakdown.py
echo "QUEUE14 DONE" >> "$LOG"
