#!/usr/bin/env python
"""Word-timing calibration from CTC logits (reference
`scripts/calibrate_model.py` + `open_seq2seq/utils/ctc_decoder.py:5-38`):
derives the constant start/end frame offsets between greedy-CTC word
boundaries and ground-truth word timings, for the streaming ASR app's
timestamp output.

Input: a logits pickle ({wav: (T, V)}) and a target.json of
{wav: [[word, start_sec, end_sec], ...]}.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from openseq2seq_tpu.data.speech2text.speech2text import \
    load_pre_existing_vocabulary  # noqa: E402


def word_frames_from_logits(logits, alphabet, blank_id=None):
    """Greedy decode with per-word (start_frame, end_frame)."""
    V = logits.shape[1]
    if blank_id is None:
        blank_id = V - 1
    best = np.argmax(logits, axis=1)
    words, cur, start, prev = [], [], None, -1
    for t, k in enumerate(best):
        ch = "" if k == blank_id else alphabet[int(k)]
        if ch and k != prev:
            if ch == " ":
                if cur:
                    words.append(("".join(cur), start, t - 1))
                cur, start = [], None
            else:
                if start is None:
                    start = t
                cur.append(ch)
        prev = int(k)
    if cur:
        words.append(("".join(cur), start, len(best) - 1))
    return words


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--logits", required=True)
    parser.add_argument("--target", required=True, help="target.json")
    parser.add_argument("--vocab", required=True)
    parser.add_argument("--frame_seconds", type=float, default=0.02,
                        help="seconds per output logit frame")
    args = parser.parse_args(argv)

    with open(args.logits, "rb") as f:
        logits_map = pickle.load(f)
    with open(args.target) as f:
        targets = json.load(f)
    char2idx = load_pre_existing_vocabulary(args.vocab, read_chars=True)
    alphabet = [c for c, _ in sorted(char2idx.items(),
                                     key=lambda kv: kv[1])]

    start_deltas, end_deltas = [], []
    for wav, ref_words in targets.items():
        if wav not in logits_map:
            continue
        hyp = word_frames_from_logits(
            np.asarray(logits_map[wav], np.float32), alphabet)
        for (hw, hs, he), ref in zip(hyp, ref_words):
            word, rs, re = ref[0], float(ref[1]), float(ref[2])
            if hw != word:
                continue
            start_deltas.append(hs * args.frame_seconds - rs)
            end_deltas.append(he * args.frame_seconds - re)
    if not start_deltas:
        print("No matching words found — cannot calibrate")
        return 1
    print("start_shift: {:.4f}s  end_shift: {:.4f}s "
          "({} aligned words)".format(float(np.mean(start_deltas)),
                                      float(np.mean(end_deltas)),
                                      len(start_deltas)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
