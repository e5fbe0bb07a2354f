#!/usr/bin/env python
"""Text-to-speech synthesis from the command line — the script form of
the reference's interactive T2S notebook cells
(`scripts/tacotron_save_spec.py` + `scripts/wavenet_naive_infer.py`
there): load a trained Tacotron-2/Centaur checkpoint once, synthesize a
wav per input line via Griffin-Lim, optionally re-vocode the predicted
mel with a trained WaveNet.

  python scripts/synthesize.py \
      --config_file=example_configs/text2speech/tacotron_LJ.py \
      --checkpoint=<logdir>/checkpoints/<step> \
      --out_dir=/tmp/tts "the quick brown fox" "hello world"

  # neural vocoder instead of Griffin-Lim:
  ... --vocoder_config=example_configs/text2speech/wavenet_LJ.py \
      --vocoder_checkpoint=<wavenet logdir>/checkpoints/<step>
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
from openseq2seq_tpu.utils.logging import deco_print  # noqa: E402


def _save_wav(path, wav, sr):
    from scipy.io import wavfile
    peak = float(np.max(np.abs(wav))) or 1.0
    wavfile.write(path, sr, (wav / peak * 0.9 * 32767).astype(np.int16))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out_dir", default=".")
    parser.add_argument("--vocoder_config",
                        help="WaveNet recipe for neural vocoding "
                             "(default: Griffin-Lim)")
    parser.add_argument("--vocoder_checkpoint")
    parser.add_argument("texts", nargs="*")
    args = parser.parse_args(argv)

    _, base_config, base_model, _ = get_base_config(
        ["--config_file", args.config_file])
    model = base_model(params=base_config, mode="interactive_infer")
    state = restore_state(model, args.checkpoint)
    forward = jax.jit(model.eval_step)
    dl = model.get_data_layer()
    sr = dl.params.get("sample_freq", 22050)

    vocoder = None
    if args.vocoder_config:
        if not args.vocoder_checkpoint:
            parser.error("--vocoder_config requires --vocoder_checkpoint")
        _, v_config, v_model, _ = get_base_config(
            ["--config_file", args.vocoder_config])
        vocoder = v_model(params=v_config, mode="interactive_infer")
        vocoder_state = restore_state(vocoder, args.vocoder_checkpoint)

    os.makedirs(args.out_dir, exist_ok=True)

    def synthesize(text: str, idx: int) -> str:
        batch = dl.create_interactive_batch(text)
        out = jax.device_get(forward(state, batch))
        spec, lengths = out["outputs"]["decoder_output"]["outputs"]
        n = int(np.asarray(lengths)[0])
        mel = np.asarray(spec)[0, :n]
        if vocoder is not None:
            # mel hop defaults to n_fft//4 (data/text2speech/speech_utils)
            hop = dl.params.get("hop_length") or \
                dl.params.get("n_fft", 1024) // 4
            wav = vocoder.generate(
                vocoder_state, conditioning=mel[None].astype(np.float32),
                n_samples=n * int(hop))[0]
        else:
            wav = model.synthesize_wav(mel)
        path = os.path.join(args.out_dir, "synth_{}.wav".format(idx))
        _save_wav(path, wav, sr)
        return path

    texts = args.texts
    if not texts:
        deco_print("Enter text lines (ctrl-D to exit):")
        texts = [line.strip() for line in sys.stdin if line.strip()]
    for i, text in enumerate(texts):
        path = synthesize(text, i)
        print("{} -> {}".format(text, path))
    return 0


if __name__ == "__main__":
    sys.exit(main())
