#!/usr/bin/env python
"""Streaming ASR demo (reference `demo_streaming_asr.py`, which reads a
microphone; this environment has no audio device, so the demo streams a
wav file frame-by-frame through FrameASR and prints the live
transcript).

  python scripts/demo_streaming_asr.py \
      --config_file=example_configs/speech2text/w2lplus_toy.py \
      --checkpoint=/tmp/os2s_toy_logs/checkpoints/150 \
      --wav=/tmp/os2s_toy_speech/toy_0.wav \
      [--beam_width=32 --lm=lm.arpa --alpha=1.0 --beta=0.5]

Transducer (RNN-T) models stream natively (carried prediction-net
state, no CTC merge): pass --transducer and a transducer config, and
remember --timestep_duration must include the encoder time stride
(Conformer: 0.01 hop x 4 subsampling = 0.04).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from openseq2seq_tpu.utils.config import get_base_config  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--wav", required=True)
    parser.add_argument("--frame_len", type=float, default=0.2)
    parser.add_argument("--frame_overlap", type=float, default=0.4)
    parser.add_argument("--timestep_duration", type=float, default=0.01)
    parser.add_argument("--beam_width", type=int, default=1)
    parser.add_argument("--lm", default=None)
    parser.add_argument("--alpha", type=float, default=2.0)
    parser.add_argument("--beta", type=float, default=0.5)
    parser.add_argument("--transducer", action="store_true",
                        help="stream via TransducerFrameASR (RNN-T "
                             "config required)")
    args = parser.parse_args(argv)

    from scipy.io import wavfile
    from openseq2seq_tpu.apps.frame_asr import (FrameASR,
                                                TransducerFrameASR)

    _, base_config, base_model, _ = get_base_config(
        ["--config_file", args.config_file])
    model = base_model(params=base_config, mode="interactive_infer")
    if args.transducer:
        asr = TransducerFrameASR(model, checkpoint=args.checkpoint,
                                 frame_len=args.frame_len,
                                 frame_overlap=args.frame_overlap,
                                 timestep_duration=args.timestep_duration)
    else:
        asr = FrameASR(model, checkpoint=args.checkpoint,
                       frame_len=args.frame_len,
                       frame_overlap=args.frame_overlap,
                       timestep_duration=args.timestep_duration,
                       beam_width=args.beam_width,
                       language_model=args.lm,
                       alpha=args.alpha, beta=args.beta)

    sr, signal = wavfile.read(args.wav)
    if signal.dtype.kind == "i":
        signal = signal.astype(np.float32) / np.iinfo(signal.dtype).max
    n = asr.n_frame_len
    pad = (-len(signal)) % n
    signal = np.concatenate(
        [signal, np.random.randn(pad).astype(np.float32) * 1e-3])

    transcript = ""
    for i in range(0, len(signal), n):
        piece = asr.transcribe(signal[i:i + n])
        if args.beam_width > 1:
            transcript = piece          # beam mode returns full text
        else:
            transcript += piece
        print("\r[{:6.2f}s] {}".format((i + n) / sr, transcript),
              end="", flush=True)
    tail = asr.flush()
    transcript = tail if args.beam_width > 1 else transcript + tail
    print("\nFinal transcript: {}".format(transcript.strip()))
    if args.beam_width > 1:
        print("Word timestamps:", asr.get_word_timestamps())
    return 0


if __name__ == "__main__":
    sys.exit(main())
