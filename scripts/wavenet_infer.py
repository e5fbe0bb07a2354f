#!/usr/bin/env python
"""Autoregressive WaveNet synthesis from a trained checkpoint
(reference `scripts/wavenet_naive_infer.py`, which loops the session
one sample at a time; here generation is the fast-queue `lax.scan` in
`encoders/wavenet_encoder.py::wavenet_generate`).

Usage:
  python scripts/wavenet_infer.py --config_file=<wavenet config> \
      --logdir=<ckpt dir> --n_samples=16000 --output=out.wav \
      [--temperature=0.9]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--logdir", default=None,
                   help="checkpoint dir (defaults to the config's)")
    p.add_argument("--n_samples", type=int, default=16000)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--output", default="wavenet_syn.wav")
    p.add_argument("--unconditioned", action="store_true",
                   help="skip mel conditioning")
    args = p.parse_args(argv)

    import runpy

    import jax
    from scipy.io import wavfile

    from openseq2seq_tpu.training.trainer import restore_state
    from openseq2seq_tpu.utils.config import _latest_checkpoint

    module = runpy.run_path(args.config_file)
    cfg = dict(module["base_params"])
    cfg.update(module.get("infer_params", {}) or {})
    model_cls = module["base_model"]
    model = model_cls(params=cfg, mode="eval")

    logdir = args.logdir or cfg.get("logdir")
    ckpt = _latest_checkpoint(logdir) if logdir else None
    state = restore_state(model, ckpt)
    if ckpt:
        print("Restored {}".format(ckpt))
    else:
        print("WARNING: no checkpoint found — synthesizing from "
              "random init")

    cond = None
    if not args.unconditioned:
        batch = next(iter(model.get_data_layer().iterate_one_epoch()))
        cond = np.asarray(batch["source_tensors"][2][:1])
    wav = model.generate(state, conditioning=cond,
                         n_samples=args.n_samples,
                         temperature=args.temperature,
                         rng=jax.random.PRNGKey(0))[0]
    sr = model.get_data_layer().params.get("sample_freq", 22050)
    peak = float(np.max(np.abs(wav))) or 1.0
    wavfile.write(args.output, sr,
                  (wav / peak * 0.9 * 32767).astype(np.int16))
    print("Wrote {} samples at {} Hz to {}".format(
        len(wav), sr, args.output))
    return 0


if __name__ == "__main__":
    sys.exit(main())
