#!/usr/bin/env python
"""Interactive inference example (the script form of the reference's
`Interactive_Infer_example.ipynb`): load a trained Speech2Text model
once, then transcribe wav files passed on stdin or as arguments.

  python scripts/interactive_infer_example.py \
      --config_file=example_configs/speech2text/w2lplus_toy.py \
      --checkpoint=/tmp/os2s_toy_logs/checkpoints/150 a.wav b.wav
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

from openseq2seq_tpu.training.trainer import restore_state  # noqa: E402
from openseq2seq_tpu.utils.config import get_base_config  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("wavs", nargs="*")
    args = parser.parse_args(argv)

    _, base_config, base_model, _ = get_base_config(
        ["--config_file", args.config_file])
    model = base_model(params=base_config, mode="interactive_infer")
    state = restore_state(model, args.checkpoint)
    forward = jax.jit(model.eval_step)
    dl = model.get_data_layer()

    def transcribe(path: str) -> str:
        batch = dl.create_interactive_batch(path)
        out = jax.device_get(forward(state, batch))
        ids, lengths = out["outputs"]["decoder_output"]["outputs"]
        return dl.decode_ids(np.asarray(ids)[0][:int(lengths[0])])

    if args.wavs:
        for wav in args.wavs:
            print("{}: {}".format(wav, transcribe(wav)))
        return 0
    print("Enter wav paths (one per line, ctrl-D to exit):")
    for line in sys.stdin:
        path = line.strip()
        if path:
            print(transcribe(path))
    return 0


if __name__ == "__main__":
    sys.exit(main())
