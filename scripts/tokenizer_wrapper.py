#!/usr/bin/env python
"""Tokenizer train/encode/decode CLI (reference `tokenizer_wrapper.py`,
which wraps sentencepiece). Two built-in algorithms:

  --algorithm=bpe        classic BPE merges (`tokenizer.Subtokenizer`)
  --algorithm=wordpiece  T2T wordpiece, vocab-file and id compatible
                         with the reference Transformer pipeline
                         (`wordpiece.WordpieceSubtokenizer`; reference
                         open_seq2seq/data/text2text/tokenizer.py)

  python scripts/tokenizer_wrapper.py train --corpus=a.txt,b.txt \
      --vocab_size=32000 --model_prefix=m_common --algorithm=wordpiece
  python scripts/tokenizer_wrapper.py encode --model=m_common.vocab \
      --input=test.txt --output=test.tok
  python scripts/tokenizer_wrapper.py decode --model=m_common.vocab \
      --input=test.tok --output=test.detok

encode/decode auto-detect the vocab format: files of quoted subtokens
('tok' per line, the reference's format) load as wordpiece.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from openseq2seq_tpu.data.text2text.tokenizer import \
    Subtokenizer  # noqa: E402
from openseq2seq_tpu.data.text2text.wordpiece import \
    WordpieceSubtokenizer  # noqa: E402


def _is_wordpiece_vocab(path: str) -> bool:
    with open(path, encoding="utf-8") as f:
        first = f.readline().strip()
    return len(first) >= 2 and first[0] == "'" and first[-1] == "'"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("command", choices=["train", "encode", "decode"])
    parser.add_argument("--corpus", default="")
    parser.add_argument("--vocab_size", type=int, default=32000)
    parser.add_argument("--model_prefix", default="bpe")
    parser.add_argument("--model", default="")
    parser.add_argument("--input", default="")
    parser.add_argument("--output", default="")
    parser.add_argument("--algorithm", choices=["bpe", "wordpiece"],
                        default="bpe")
    parser.add_argument("--threshold", type=int, default=327,
                        help="wordpiece: accepted |vocab - target| slack")
    args = parser.parse_args(argv)

    if args.command == "train":
        files = [f for f in args.corpus.split(",") if f]
        out = args.model_prefix + ".vocab"
        if args.algorithm == "wordpiece":
            tok = WordpieceSubtokenizer.init_from_files(
                out, files, target_vocab_size=args.vocab_size,
                threshold=args.threshold)
            print("Trained wordpiece vocab of {} subtokens -> {}".format(
                tok.vocab_size, out))
            return 0
        tok = Subtokenizer.init_from_files(files, args.vocab_size)
        tok.save_vocab(out)
        print("Trained BPE vocab of {} subtokens -> {}".format(
            tok.vocab_size, out))
        return 0

    if _is_wordpiece_vocab(args.model):
        tok = WordpieceSubtokenizer(args.model)
    else:
        tok = Subtokenizer.from_vocab_file(args.model)
    with open(args.input, encoding="utf-8") as fin, \
            open(args.output, "w", encoding="utf-8") as fout:
        for line in fin:
            if args.command == "encode":
                ids = tok.encode(line.strip())
                fout.write(" ".join(map(str, ids)) + "\n")
            else:
                ids = [int(t) for t in line.split()]
                fout.write(tok.decode(ids) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
