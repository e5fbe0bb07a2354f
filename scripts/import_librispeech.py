#!/usr/bin/env python
"""Build LibriSpeech CSVs for the Speech2Text data layer (reference
`scripts/import_librivox.py`): walks an extracted LibriSpeech split
(`<root>/<split>/<speaker>/<chapter>/*.trans.txt` + audio files) and
writes `wav_filename,wav_filesize,transcript` rows plus the 28-char
vocab.

Audio must already be wav (LibriSpeech ships flac — convert with
`ffmpeg -i x.flac x.wav` or sox; pass --audio_ext flac to reference the
flac paths directly if your featurizer build reads them).

  python scripts/import_librispeech.py --root=/data/LibriSpeech \
      --split=train-clean-100 --out=/data/librispeech
"""
from __future__ import annotations

import argparse
import os
import sys

VOCAB = list("abcdefghijklmnopqrstuvwxyz' ")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--split", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--audio_ext", default="wav")
    args = parser.parse_args(argv)

    split_dir = os.path.join(args.root, args.split)
    if not os.path.isdir(split_dir):
        print("split not found:", split_dir)
        return 1
    os.makedirs(args.out, exist_ok=True)
    rows = []
    for speaker in sorted(os.listdir(split_dir)):
        sdir = os.path.join(split_dir, speaker)
        if not os.path.isdir(sdir):
            continue
        for chapter in sorted(os.listdir(sdir)):
            cdir = os.path.join(sdir, chapter)
            trans = os.path.join(
                cdir, "{}-{}.trans.txt".format(speaker, chapter))
            if not os.path.exists(trans):
                continue
            with open(trans, encoding="utf-8") as f:
                for line in f:
                    utt_id, _, text = line.partition(" ")
                    audio = os.path.join(
                        cdir, "{}.{}".format(utt_id, args.audio_ext))
                    if not os.path.exists(audio):
                        continue
                    rows.append((audio, os.path.getsize(audio),
                                 text.strip().lower()))
    csv_path = os.path.join(
        args.out, "librivox-{}.csv".format(args.split))
    with open(csv_path, "w", encoding="utf-8") as f:
        f.write("wav_filename,wav_filesize,transcript\n")
        for audio, size, text in rows:
            f.write('{},{},"{}"\n'.format(audio, size,
                                          text.replace('"', "")))
    vocab_path = os.path.join(args.out, "vocab.txt")
    if not os.path.exists(vocab_path):
        with open(vocab_path, "w") as f:
            for c in VOCAB:
                f.write(c + "\n")
    print("Wrote {} utterances to {}".format(len(rows), csv_path))
    return 0


if __name__ == "__main__":
    sys.exit(main())
