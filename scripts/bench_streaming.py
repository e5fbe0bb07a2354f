#!/usr/bin/env python
"""Streaming-ASR latency benchmark: per-0.2s-frame transcription latency
through FrameASR (featurize -> jitted forward -> incremental decode).

Prints one JSON line:
  {"metric": "frame_asr_latency_ms", "value": p50,
   "p90": ..., "p99": ..., "rtf": real-time-factor, "unit": "ms/frame"}

Real-time budget: a 0.2 s frame must finish in < 200 ms (rtf < 1).
Without --checkpoint the model runs with random init — latency is
shape-dependent only, so the numbers are identical to a trained model.

Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/bench_streaming.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file",
                        default="example_configs/speech2text/"
                                "w2lplus_toy.py")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--frame_len", type=float, default=0.2)
    parser.add_argument("--frame_overlap", type=float, default=0.4)
    parser.add_argument("--n_frames", type=int, default=50)
    parser.add_argument("--beam_width", type=int, default=16)
    args = parser.parse_args(argv)

    from openseq2seq_tpu.apps.frame_asr import FrameASR
    from openseq2seq_tpu.utils.config import get_base_config

    cfg_args, base_config, base_model, config_module = get_base_config(
        ["--config_file", args.config_file, "--mode",
         "interactive_infer", "--no_dir_check"])
    params = dict(base_config)
    params.update(config_module.get("interactive_infer_params", {}))
    model = base_model(params=params, mode="interactive_infer")
    asr = FrameASR(model, checkpoint=args.checkpoint,
                   frame_len=args.frame_len,
                   frame_overlap=args.frame_overlap,
                   beam_width=args.beam_width)

    sr = model.get_data_layer().params.get("sample_freq", 16000)
    frame_samples = int(args.frame_len * sr)
    rng = np.random.RandomState(0)
    # synthetic speech-band noise; latency is shape-dependent only
    frames = [0.1 * rng.randn(frame_samples).astype(np.float32)
              for _ in range(args.n_frames)]

    for f in frames[:3]:               # warmup / compile all shapes
        asr.transcribe(f)
    asr.reset()

    lat = []
    for f in frames:
        t0 = time.perf_counter()
        asr.transcribe(f)
        lat.append(1e3 * (time.perf_counter() - t0))
    lat = np.asarray(lat)

    print(json.dumps({
        "metric": "frame_asr_latency_ms",
        "value": round(float(np.percentile(lat, 50)), 2),
        "p90": round(float(np.percentile(lat, 90)), 2),
        "p99": round(float(np.percentile(lat, 99)), 2),
        "rtf": round(float(np.mean(lat)) / (1e3 * args.frame_len), 4),
        "unit": "ms/frame",
    }))


if __name__ == "__main__":
    main()
