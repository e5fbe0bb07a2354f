#!/usr/bin/env python
"""Scan a training log for the best eval metric (reference
`scripts/get_best_accuracy.py`, generalized: works with any
"<metric>: <float>" eval line our trainer prints — Validation loss /
WER / BLEU / EVAL Accuracy).

Usage:
  python scripts/get_best_accuracy.py logfile [--metric "Validation WER"]
      [--mode min|max]
"""
from __future__ import annotations

import argparse
import re
import sys


def best_metric(path: str, metric: str, mode: str = "min"):
    rx = re.compile(re.escape(metric) + r"[:=]?\s*([0-9]*\.?[0-9]+)")
    best, best_line = None, None
    with open(path, errors="replace") as f:
        for i, line in enumerate(f, 1):
            m = rx.search(line)
            if not m:
                continue
            v = float(m.group(1))
            if best is None or (v < best if mode == "min" else v > best):
                best, best_line = v, i
    return best, best_line


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("logfile")
    p.add_argument("--metric", default="Validation loss")
    p.add_argument("--mode", choices=["min", "max"], default="min")
    args = p.parse_args(argv)
    best, line = best_metric(args.logfile, args.metric, args.mode)
    if best is None:
        print("No '{}' lines found in {}".format(args.metric,
                                                 args.logfile))
        return 1
    print("Best {}: {} (line {})".format(args.metric, best, line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
