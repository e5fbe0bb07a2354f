#!/usr/bin/env python
"""Turn a dumped-logits pickle into a per-word timing CSV (reference
`scripts/dump_to_time.py`): greedy-decode each utterance's CTC logits,
convert word frame boundaries to seconds, apply the calibration
start/end shifts from `scripts/calibrate_model.py`.

Usage:
  python scripts/dump_to_time.py --dumpfile logits.pkl \
      --vocab_file vocab.txt [--start_shift S --end_shift E |
      --calibration_file calib.txt] [--step_size 0.02] \
      [--save_file sample.csv]
"""
from __future__ import annotations

import argparse
import csv
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from calibrate_model import word_frames_from_logits  # noqa: E402
from openseq2seq_tpu.data.speech2text.speech2text import \
    load_pre_existing_vocabulary  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Infer words' timestamps from logits dumps")
    p.add_argument("--dumpfile", required=True)
    p.add_argument("--vocab_file", required=True)
    p.add_argument("--start_shift", type=float, default=0.0)
    p.add_argument("--end_shift", type=float, default=0.0)
    p.add_argument("--calibration_file", default=None)
    p.add_argument("--step_size", type=float, default=0.02,
                   help="seconds of audio per logits frame")
    p.add_argument("--save_file", default="sample.csv")
    args = p.parse_args(argv)

    start_shift, end_shift = args.start_shift, args.end_shift
    if args.calibration_file:
        with open(args.calibration_file) as f:
            start_shift, end_shift = map(float, f.read().split())

    vocab = load_pre_existing_vocabulary(args.vocab_file,
                                         read_chars=True)
    alphabet = {i: c for c, i in vocab.items()}

    with open(args.dumpfile, "rb") as f:
        dump = pickle.load(f)

    with open(args.save_file, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wav_filename", "transcript", "start_time",
                    "end_time"])
        for wav, logits in dump.items():
            words = word_frames_from_logits(logits, alphabet)
            for word, s, e in words:
                w.writerow([wav, word,
                            round(s * args.step_size + start_shift, 3),
                            round(e * args.step_size + end_shift, 3)])
    print("Wrote word timings to {}".format(args.save_file))
    return 0


if __name__ == "__main__":
    sys.exit(main())
