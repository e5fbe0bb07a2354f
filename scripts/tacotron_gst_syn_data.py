#!/usr/bin/env python
"""GST synthetic-data pipeline helpers (reference scripts
`tacotron_gst_combine_csv.py`, `tacotron_gst_create_infer_csv.py`,
`nsr_create_syn_train_csv.py` rolled into one CLI — wav synthesis
itself is `run.py --mode=infer` on a GST config, which already saves
wavs via `Text2Speech.finalize_inference`).

Subcommands:
  combine   merge per-book metadata.csv files (pipe-separated
            MAILABS layout) into one train csv
  infercsv  build the infer csv (one transcript per line) that drives
            GST synthesis
  traincsv  turn synthesized wavs + transcripts into a DeepSpeech-style
            ASR training csv (wav_filename,wav_filesize,transcript)
            with reference-compatible text normalization
"""
from __future__ import annotations

import argparse
import csv
import os
import string
import sys

_IN = "\"'’“”àâèéêü"
_OUT = "'''''aaeeeu"
_TABLE = str.maketrans(_IN, _OUT,
                       string.punctuation.replace("'", ""))


def normalize_transcript(text: str) -> str:
    """Lowercase, strip punctuation/diacritics (reference
    `nsr_create_syn_train_csv.py:_normalize_transcript`)."""
    return text.translate(_TABLE).lower().strip()


def combine(args):
    rows = []
    for sub in args.sub_dirs:
        path = os.path.join(args.data_root, sub, "metadata.csv")
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("|")
                if len(parts) < 2:
                    continue
                wav = os.path.join(args.data_root, sub, "wavs",
                                   parts[0] + ".wav")
                text = parts[2] if len(parts) > 2 else parts[1]
                rows.append((wav, text))
    with open(args.output, "w", encoding="utf-8") as f:
        for wav, text in rows:
            f.write("{}|{}|{}\n".format(wav, text, text))
    print("Wrote {} rows to {}".format(len(rows), args.output))


def infercsv(args):
    n = 0
    with open(args.transcripts, encoding="utf-8") as fin, \
            open(args.output, "w", encoding="utf-8") as fout:
        for line in fin:
            text = line.rstrip("\n").split("|")[-1].strip()
            if text:
                fout.write("{}|{}|{}\n".format(n, text, text))
                n += 1
    print("Wrote {} infer rows to {}".format(n, args.output))


def traincsv(args):
    with open(args.transcripts, encoding="utf-8") as f:
        texts = [line.rstrip("\n").split("|")[-1] for line in f]
    rows, missing = [], 0
    for i, text in enumerate(texts):
        wav = os.path.join(args.syn_dir, args.pattern.format(i))
        if not os.path.exists(wav):
            missing += 1
            continue
        rows.append((wav, os.path.getsize(wav),
                     normalize_transcript(text)))
    with open(args.output, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["wav_filename", "wav_filesize", "transcript"])
        w.writerows(rows)
    print("Wrote {} rows to {} ({} missing wavs skipped)".format(
        len(rows), args.output, missing))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("combine")
    c.add_argument("--data_root", required=True)
    c.add_argument("--sub_dirs", nargs="+", required=True)
    c.add_argument("--output", required=True)
    c.set_defaults(fn=combine)

    i = sub.add_parser("infercsv")
    i.add_argument("--transcripts", required=True)
    i.add_argument("--output", required=True)
    i.set_defaults(fn=infercsv)

    t = sub.add_parser("traincsv")
    t.add_argument("--transcripts", required=True)
    t.add_argument("--syn_dir", required=True)
    t.add_argument("--pattern", default="sample_{}.wav")
    t.add_argument("--output", required=True)
    t.set_defaults(fn=traincsv)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
