#!/usr/bin/env python
"""Offline CTC beam-search decoding with n-gram LM rescoring and
alpha/beta grid search over dumped logits (reference
`scripts/decode.py`, 257 LoC).

Inputs: a logits pickle produced by ``run.py --mode=infer`` with
``decoder_params/infer_logits_to_pickle True`` ({wav: (T, V) logits}),
the eval CSV with reference transcripts, the char vocab, and an ARPA LM.

  python scripts/decode.py --logits=dump.pkl --labels=dev.csv \
      --vocab=vocab.txt --lm=lm.arpa \
      --alpha=1.0 --alpha_max=3.0 --alpha_step=0.5 \
      --beta=0.0 --beta_max=2.0 --beta_step=1.0 --beam_width=128
"""
from __future__ import annotations

import argparse
import csv
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from openseq2seq_tpu.data.speech2text.speech2text import \
    load_pre_existing_vocabulary  # noqa: E402
from openseq2seq_tpu.ops.ctc_beam import (Scorer,  # noqa: E402
                                          ctc_beam_search_decoder)
from openseq2seq_tpu.utils.metrics import levenshtein  # noqa: E402


def softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def wer_for_params(logits_map, labels, alphabet, lm_path, alpha, beta,
                   beam_width):
    scorer = None
    if lm_path:
        scorer = Scorer(alpha=alpha, beta=beta, model_path=lm_path)
    total_dist, total_words = 0, 0
    for wav, ref in labels.items():
        if wav not in logits_map:
            continue
        probs = softmax(np.asarray(logits_map[wav], np.float32))
        res = ctc_beam_search_decoder(probs, alphabet,
                                      beam_size=beam_width,
                                      ext_scorer=scorer)
        hyp = res[0][1]
        total_dist += levenshtein(ref.split(), hyp.split())
        total_words += len(ref.split())
    return total_dist / max(total_words, 1)


def frange(lo, hi, step):
    vals = []
    v = lo
    while v <= hi + 1e-9:
        vals.append(round(v, 6))
        v += step
    return vals or [lo]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--logits", required=True)
    parser.add_argument("--labels", required=True,
                        help="CSV with wav_filename,...,transcript")
    parser.add_argument("--vocab", required=True)
    parser.add_argument("--lm", default=None, help="ARPA LM path")
    parser.add_argument("--alpha", type=float, default=2.0)
    parser.add_argument("--alpha_max", type=float, default=None)
    parser.add_argument("--alpha_step", type=float, default=0.5)
    parser.add_argument("--beta", type=float, default=0.0)
    parser.add_argument("--beta_max", type=float, default=None)
    parser.add_argument("--beta_step", type=float, default=0.5)
    parser.add_argument("--beam_width", type=int, default=128)
    parser.add_argument("--infer_output_file", default=None)
    args = parser.parse_args(argv)

    with open(args.logits, "rb") as f:
        logits_map = pickle.load(f)
    char2idx = load_pre_existing_vocabulary(args.vocab, read_chars=True)
    alphabet = [c for c, _ in sorted(char2idx.items(),
                                     key=lambda kv: kv[1])]
    labels = {}
    with open(args.labels, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            labels[row["wav_filename"]] = row["transcript"]

    alphas = frange(args.alpha, args.alpha_max or args.alpha,
                    args.alpha_step)
    betas = frange(args.beta, args.beta_max or args.beta, args.beta_step)
    best = (None, None, float("inf"))
    for a in alphas:
        for b in betas:
            wer = wer_for_params(logits_map, labels, alphabet, args.lm,
                                 a, b, args.beam_width)
            print("alpha={:.2f} beta={:.2f} WER={:.4f}".format(a, b, wer),
                  flush=True)
            if wer < best[2]:
                best = (a, b, wer)
    print("BEST: alpha={} beta={} WER={:.4f}".format(*best))

    if args.infer_output_file:
        scorer = Scorer(alpha=best[0], beta=best[1],
                        model_path=args.lm) if args.lm else None
        with open(args.infer_output_file, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["wav_filename", "predicted_transcript"])
            for wav, logits in logits_map.items():
                probs = softmax(np.asarray(logits, np.float32))
                res = ctc_beam_search_decoder(
                    probs, alphabet, beam_size=args.beam_width,
                    ext_scorer=scorer)
                writer.writerow([wav, res[0][1]])
    return 0


if __name__ == "__main__":
    sys.exit(main())
