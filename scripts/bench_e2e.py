#!/usr/bin/env python
"""End-to-end Jasper-10x5 training benchmark: REAL host input pipeline
(wav load -> logfbank featurization -> SpecAugment -> collate ->
prefetch thread) feeding the jitted train step, via the exact flagship
recipe path (`example_configs/speech2text/jasper10x5_LibriSpeech.py`
loaded through the run.py config loader with --benchmark rewrite).

Answers VERDICT r2 item 6: can the host actually feed the 164.8
utt/s/chip synthetic ceiling (BENCH_r02)? Reports:

  * host_featurize_utt_per_sec  — cold-cache featurization rate,
    host only (the reference's classic bottleneck,
    `docs/sources/source/speech-commands.rst:28`);
  * host_cached_utt_per_sec     — warm npz-cache rate (the recipe ships
    cache_features=True; masks drawn per epoch on load);
  * value                       — sustained end-to-end utt/s/chip over
    warm-cache epochs, device step + host pipeline overlapped by the
    prefetch thread, host->device transfer included.

Prints ONE JSON line like bench.py. Usage:
    python scripts/bench_e2e.py [--steps 30] [--data_dir DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V100_BASELINE_UTT_PER_SEC = 32.0
SYNTHETIC_CEILING = 168.3          # BENCH_r03.json, same model/bs/T
RECIPE = "example_configs/speech2text/jasper10x5_LibriSpeech.py"


def _host_only_rate(base_config, n_batches: int) -> float:
    """Iterate the data layer alone (no device) and return utt/s."""
    dl_cls = base_config["data_layer"]
    p = dict(base_config["data_layer_params"])
    p["mode"] = "train"
    p["batch_size"] = base_config["batch_size_per_gpu"]
    p["shuffle"] = False
    dl = dl_cls(p, model=None)
    dl.seed(0)
    it = iter(dl.iterate_one_epoch())
    next(it)                         # exclude one-time pandas/vocab setup
    t0 = time.time()
    n = 0
    for _ in range(n_batches):
        next(it)
        n += p["batch_size"]
    return n / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30,
                    help="timed end-to-end steps (plus 3 warmup)")
    ap.add_argument("--data_dir",
                    default=os.environ.get("BENCH_E2E_DATA",
                                           "/tmp/fake_librispeech"))
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--host_batches", type=int, default=4,
                    help="batches for the host-only phases")
    ap.add_argument("--n_utts", type=int, default=1280)
    args = ap.parse_args()

    from openseq2seq_tpu.test_utils import fake_librispeech
    data_dir, _ = fake_librispeech.generate(args.data_dir,
                                            n_utts=args.n_utts)
    os.environ["LIBRISPEECH_DIR"] = data_dir

    from openseq2seq_tpu.utils.config import (apply_benchmark_mode,
                                              get_base_config)
    argv = ["--config_file={}".format(RECIPE), "--mode=train",
            "--benchmark",
            "--batch_size_per_gpu", str(args.batch_size)]
    cli, base_config, base_model, _module = get_base_config(argv)
    base_config = apply_benchmark_mode(base_config, args.steps, 0)

    cache_dir = os.path.join(data_dir, ".feature_cache")
    # phase 1: cold host featurization (fresh cache dir)
    import shutil
    shutil.rmtree(cache_dir, ignore_errors=True)
    cold = _host_only_rate(base_config, args.host_batches)
    print("host featurize (cold cache): {:.1f} utt/s".format(cold),
          file=sys.stderr, flush=True)

    # phase 2: warm the whole cache, then measure cached rate
    with open(os.path.join(data_dir, "librivox-train-clean-100.csv")) as f:
        n_utts = sum(1 for _ in f) - 1
    _host_only_rate(base_config, max(n_utts // args.batch_size - 1, 1))
    warm = _host_only_rate(base_config, args.host_batches)
    print("host featurize (warm cache): {:.1f} utt/s".format(warm),
          file=sys.stderr, flush=True)

    # phase 3: end-to-end — real data layer + prefetch + jitted step
    import jax
    from openseq2seq_tpu.parallel.mesh import (mesh_from_config,
                                               prefetch_to_device,
                                               replicated_sharding,
                                               shard_batch)
    mesh = mesh_from_config(base_config)
    n_chips = mesh.devices.size
    model = base_model(params=base_config, mode="train", mesh=mesh)
    dl = model.get_data_layer()
    # the trainer's exact two-stage pipeline: featurizer thread +
    # device_put two steps ahead (H2D overlaps the running step)
    batches = prefetch_to_device(dl.prefetch(dl.iterate_forever()), mesh)

    batch, device_batch = next(batches)
    state = model.init_state(batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = jax.jit(model.train_step, donate_argnums=(0,))
    from openseq2seq_tpu.training.trainer import make_base_rng
    base_rng = make_base_rng(base_config)

    for i in range(3):   # compile + warmup
        state, metrics = step_fn(state, shard_batch(batch, mesh),
                                 jax.random.fold_in(base_rng, i))
    float(jax.device_get(metrics["loss"]))
    print("compiled; timing {} steps".format(args.steps),
          file=sys.stderr, flush=True)

    t0 = time.time()
    for i in range(args.steps):
        _, device_batch = next(batches)
        state, metrics = step_fn(state, device_batch,
                                 jax.random.fold_in(base_rng, 100 + i))
    loss = float(jax.device_get(metrics["loss"]))
    wall = time.time() - t0
    assert np.isfinite(loss)

    e2e = args.steps * args.batch_size / wall
    print(json.dumps({
        "metric": "jasper10x5_e2e_train_utt_per_sec_per_chip",
        "value": round(e2e, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(e2e / V100_BASELINE_UTT_PER_SEC, 3),
        "synthetic_ceiling": SYNTHETIC_CEILING,
        "host_featurize_utt_per_sec": round(cold, 1),
        "host_cached_utt_per_sec": round(warm, 1),
        "n_chips": n_chips,
        "batch_per_chip": args.batch_size,
        "recipe": RECIPE,
    }))


if __name__ == "__main__":
    main()
