#!/usr/bin/env python
"""Sweep Jasper bench configurations (batch size / remat mode / optimizer
moment dtype / CTC impl) on the available chip and print one JSON line
per configuration. Used to pick the shipping configuration in bench.py.

Usage: python scripts/bench_sweep.py [--quick] [bs:remat:moments ...]
  e.g. python scripts/bench_sweep.py 128:none:f32 256:blocks:bf16
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_one(batch_per_chip: int, remat, moments_dtype, n_steps: int = 12,
            time_steps: int = 1000):
    import jax
    from openseq2seq_tpu.data.synthetic import SyntheticSpeechDataLayer
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.parallel.mesh import (make_mesh,
                                               replicated_sharding,
                                               shard_batch)
    from openseq2seq_tpu.zoo import jasper_model_params

    n_chips = len(jax.devices())
    mesh = make_mesh(num_data=n_chips, num_model=1)
    params = jasper_model_params(
        data_layer=SyntheticSpeechDataLayer,
        data_layer_params={
            "num_audio_features": 64,
            "tgt_vocab_size": 29,
            "time_steps": time_steps,
            "label_length": 160,
            "num_batches": 8,
        },
        num_blocks=10, block_repeat=5,
        batch_size_per_gpu=batch_per_chip,
        dtype="mixed",
        max_steps=1000000,
    )
    params["loss_params"] = {"use_pallas": True}
    params["prng_impl"] = "rbg"      # match bench.py's shipping config
    if remat:
        params["remat"] = remat
    if moments_dtype:
        params["optimizer_params"]["moments_dtype"] = moments_dtype
    model = Speech2Text(params=params, mode="train", mesh=mesh)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    device_batch = shard_batch(batch, mesh)
    step_fn = jax.jit(model.train_step, donate_argnums=(0,))
    rng = jax.random.key(0, impl="rbg")

    for _ in range(3):
        state, metrics = step_fn(state, device_batch, rng)
    float(jax.device_get(metrics["loss"]))

    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step_fn(state, device_batch, rng)
    loss = float(jax.device_get(metrics["loss"]))
    wall = time.time() - t0

    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            mem = round(stats.get("peak_bytes_in_use", 0) / 2**30, 3)
    except Exception:
        pass
    return {
        "bs": batch_per_chip,
        "remat": remat or "none",
        "moments": moments_dtype or "f32",
        "utt_per_sec_per_chip": round(
            n_steps * batch_per_chip / wall, 2),
        "peak_hbm_gb": mem,
        "loss": round(loss, 3),
    }


def main():
    specs = [a for a in sys.argv[1:] if ":" in a]
    if not specs:
        specs = ["128:none:f32", "128:blocks:bf16", "192:blocks:bf16",
                 "256:blocks:bf16", "256:blocks:f32"]
    for spec in specs:
        bs, remat, moments = spec.split(":")
        remat = {"none": None, "true": True}.get(remat, remat)
        moments = {"f32": None, "bf16": "bfloat16"}.get(moments, moments)
        try:
            print(json.dumps(run_one(int(bs), remat, moments)), flush=True)
        except Exception as e:  # OOM etc.
            print(json.dumps({"bs": int(bs), "remat": str(remat),
                              "moments": str(moments),
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
