#!/usr/bin/env python
"""Generate a LibriSpeech-SHAPED synthetic corpus so the flagship
Jasper recipe runs VERBATIM end-to-end without dataset egress
(turnkey-readiness evidence: `example_configs/speech2text/
jasper10x5_LibriSpeech.py` + `docs/reproducing_baselines.md` commands,
pointed at this corpus via LIBRISPEECH_DIR).

Writes the exact artifact names the recipe references:
  librivox-train-clean-100.csv / -360.csv / librivox-train-other-500.csv
  librivox-dev-clean.csv, librivox-test-clean.csv, vocab.txt,
  lm_corpus.txt (train transcripts, for scripts/build_lm.py)

Audio is the test-suite's deterministic tone coding
(`test_utils/toy_speech.py`): each character a distinct tone, so the
full-size Jasper reaches ~0 WER in a few hundred steps — the run
validates the recipe mechanics (schedule defaulting, masks, cache,
checkpoints, eval clipping), not acoustic modeling.

Usage: python scripts/make_synth_corpus.py [--out DIR] [--n-train N]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from openseq2seq_tpu.test_utils import toy_speech  # noqa: E402


def _lexicon(rng, n_words=60):
    letters = toy_speech.VOCAB.strip()
    words, seen = [], set()
    while len(words) < n_words:
        w = "".join(rng.choice(list(letters),
                               size=rng.randint(2, 5)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _sentences(rng, lexicon, n, min_words=6, max_words=12):
    out = []
    for _ in range(n):
        k = rng.randint(min_words, max_words + 1)
        out.append(" ".join(rng.choice(lexicon, size=k)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synthls")
    ap.add_argument("--n-train", type=int, default=400)
    ap.add_argument("--n-eval", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.02)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    lex = _lexicon(rng)
    train = _sentences(rng, lex, args.n_train)
    dev = _sentences(rng, lex, args.n_eval)
    test = _sentences(rng, lex, args.n_eval)

    os.makedirs(args.out, exist_ok=True)
    # the generator writes one CSV per call; reuse it per split with
    # distinct wav prefixes via subdirectories
    splits = {
        "librivox-train-clean-100.csv": train[::3],
        "librivox-train-clean-360.csv": train[1::3],
        "librivox-train-other-500.csv": train[2::3],
        "librivox-dev-clean.csv": dev,
        "librivox-test-clean.csv": test,
    }
    for csv_name, sents in splits.items():
        sub = os.path.join(args.out, csv_name.replace(".csv", ""))
        csv_path, vocab_path = toy_speech.generate(
            sub, transcripts=sents, seed=args.seed,
            noise=args.noise, csv_name="data.csv")
        os.replace(csv_path, os.path.join(args.out, csv_name))
    # vocab at the corpus root (recipe: LIBRISPEECH_DIR/vocab.txt)
    with open(os.path.join(args.out, "vocab.txt"), "w") as f:
        for c in toy_speech.VOCAB:
            f.write(c + "\n")
    with open(os.path.join(args.out, "lm_corpus.txt"), "w") as f:
        f.write("\n".join(train) + "\n")
    n_wavs = sum(len(s) for s in splits.values())
    print(f"wrote {n_wavs} wavs + 5 CSVs + vocab + lm_corpus under "
          f"{args.out}")


if __name__ == "__main__":
    main()
