#!/usr/bin/env python
"""Standalone BLEU scorer over hypothesis/reference text files —
the reference ships Moses' `multi-bleu.perl`
(`/root/reference/scripts/multi-bleu.perl`, used throughout its
machine-translation docs); this is the dependency-free equivalent on
the same whitespace-token BLEU as the in-training eval
(`utils/metrics.py:corpus_bleu`), with multi-bleu's -lc flag and its
familiar output line (score, n-gram precisions, brevity penalty,
length ratio).

Usage: python scripts/score_bleu.py [-lc] hyp.txt ref.txt
(For cased detokenized SacreBLEU — the number BASELINE.md quotes —
run sacrebleu on detokenized output instead; this scorer matches the
reference repo's tokenized multi-bleu workflow.)
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from openseq2seq_tpu.utils.metrics import _ngram_counts  # noqa: E402


def multi_bleu(hyps, refs, max_n=4):
    clipped = [0] * max_n
    totals = [0] * max_n
    ref_len = hyp_len = 0
    for hyp, ref in zip(hyps, refs):
        ref_len += len(ref)
        hyp_len += len(hyp)
        for n in range(1, max_n + 1):
            rc = _ngram_counts(ref, n)
            hc = _ngram_counts(hyp, n)
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            clipped[n - 1] += sum(min(c, rc.get(g, 0))
                                  for g, c in hc.items())
    precs = [c / t if t else 0.0 for c, t in zip(clipped, totals)]
    if min(precs) <= 0.0 or hyp_len == 0:
        bleu = 0.0
    else:
        log_prec = sum(math.log(p) for p in precs) / max_n
        bp = 1.0 if hyp_len > ref_len else \
            math.exp(1.0 - ref_len / max(hyp_len, 1))
        bleu = bp * math.exp(log_prec)
    bp = 1.0 if hyp_len > ref_len else \
        math.exp(1.0 - ref_len / max(hyp_len, 1))
    return bleu, precs, bp, hyp_len, ref_len


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hyp")
    ap.add_argument("ref")
    ap.add_argument("-lc", action="store_true",
                    help="lowercase before scoring")
    args = ap.parse_args()
    with open(args.hyp) as f:
        hyps = [line.strip() for line in f]
    with open(args.ref) as f:
        refs = [line.strip() for line in f]
    if len(hyps) != len(refs):
        raise SystemExit(f"line-count mismatch: {len(hyps)} hyp vs "
                         f"{len(refs)} ref")
    if args.lc:
        hyps = [h.lower() for h in hyps]
        refs = [r.lower() for r in refs]
    hyps = [h.split() for h in hyps]
    refs = [r.split() for r in refs]
    bleu, precs, bp, hyp_len, ref_len = multi_bleu(hyps, refs)
    print("BLEU = {:.2f}, {:.1f}/{:.1f}/{:.1f}/{:.1f} "
          "(BP={:.3f}, ratio={:.3f}, hyp_len={:d}, ref_len={:d})".format(
              bleu * 100.0, *(p * 100.0 for p in precs), bp,
              hyp_len / max(ref_len, 1), hyp_len, ref_len))


if __name__ == "__main__":
    main()
