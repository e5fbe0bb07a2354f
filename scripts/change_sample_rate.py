#!/usr/bin/env python
"""Recursively resample an audio tree to a target rate (reference
`scripts/change_sample_rate.py`, librosa-based; this version is
dependency-light: scipy polyphase resampling, wav/flac via soundfile if
present, wav via scipy otherwise).

Usage:
  python scripts/change_sample_rate.py --source_dir in/ --target_dir out/ \
      --sample_rate 16000
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def _read(path):
    try:
        import soundfile as sf
        data, sr = sf.read(path, dtype="float32")
        return data, sr
    except ImportError:
        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        return data.astype(np.float32), sr


def resample(data: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return data
    from math import gcd
    g = gcd(sr_in, sr_out)
    return resample_poly(data, sr_out // g, sr_in // g, axis=0)


def main(argv=None):
    p = argparse.ArgumentParser(description="Conversion parameters")
    p.add_argument("--source_dir", required=True)
    p.add_argument("--target_dir", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    args = p.parse_args(argv)

    n = 0
    for root, _, files in os.walk(args.source_dir):
        for fname in files:
            if not fname.lower().endswith((".wav", ".flac")):
                continue
            src = os.path.join(root, fname)
            rel = os.path.relpath(src, args.source_dir)
            dst = os.path.join(args.target_dir,
                               os.path.splitext(rel)[0] + ".wav")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            data, sr = _read(src)
            out = resample(data, sr, args.sample_rate)
            out = np.clip(out, -1.0, 1.0)
            wavfile.write(dst, args.sample_rate,
                          (out * 32767).astype(np.int16))
            n += 1
    print("Resampled {} files to {} Hz under {}".format(
        n, args.sample_rate, args.target_dir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
