#!/usr/bin/env python
"""Benchmark: Conformer-M CTC training throughput (beyond-parity model;
see encoders/conformer_encoder.py — the reference predates the
Conformer, so vs_baseline compares against the SAME ~32 utt/s/V100
Jasper figure bench.py uses: both are LibriSpeech CTC recipes and the
Conformer replaced Jasper as the architecture of record).

Prints ONE JSON line like the other benches:
  {"metric": "conformer_m_train_utt_per_sec_per_chip", ...}

Input: synthetic ~10 s utterances (T=1000 logfbank frames @10 ms),
bf16 "mixed", AdamW + noam schedule, fused Pallas CTC, rbg dropout
keys, u8 masks — the shipped `conformer_LibriSpeech.py` configuration
on synthetic batches (pure step time, no host IO).

Usage: [BENCH_BS=64] [BENCH_SCALE=m|l] python scripts/bench_conformer.py

BENCH_SCALE=l selects the published Conformer-L geometry (17 layers,
d=512, 8 heads, ~118M params) — the larger matmuls tile the MXU far
better than the VPU/norm-bound M scale.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

V100_BASELINE_UTT_PER_SEC = 32.0


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    from openseq2seq_tpu.data.synthetic import SyntheticSpeechDataLayer
    from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder
    from openseq2seq_tpu.encoders import ConformerEncoder
    from openseq2seq_tpu.losses import CTCLoss
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.parallel.mesh import (make_mesh,
                                               replicated_sharding,
                                               shard_batch)

    n_chips = len(jax.devices())
    batch_per_chip = int(os.environ.get("BENCH_BS", "64"))
    time_steps = 1000
    scale = os.environ.get("BENCH_SCALE", "m").lower()
    # Gulati et al. 2020 table 1: M = 16 x d256/h4, L = 17 x d512/h8
    geom = ({"num_layers": 17, "hidden_size": 512, "num_heads": 8}
            if scale == "l" else
            {"num_layers": 16, "hidden_size": 256, "num_heads": 4})

    mesh = make_mesh(num_data=n_chips, num_model=1)
    params = {
        "random_seed": 0,
        "use_horovod": False,
        "max_steps": 1000000,
        "logdir": "",
        "batch_size_per_gpu": batch_per_chip,
        "print_loss_steps": 10**9,
        "optimizer": "AdamW",
        "optimizer_params": {"learning_rate": 2.0, "beta1": 0.9,
                             "beta2": 0.98, "epsilon": 1e-9,
                             "weight_decay": 1e-6},
        "lr_policy": "transformer_policy",
        "lr_policy_params": {"learning_rate": 2.0,
                             "d_model": geom["hidden_size"],
                             "warmup_steps": 10000},
        "dtype": "mixed",
        "max_grad_norm": 5.0,
        "prng_impl": "rbg",
        "dropout_bits": int(os.environ.get("BENCH_DROPBITS", "8")),
        "encoder": ConformerEncoder,
        "encoder_params": {
            **geom,
            "conv_kernel_size": 31,
            "ffn_expansion": 4,
            "dropout_keep_prob": 0.9,
            # BENCH_ATTN_KEEP=1.0 disables attention-weight dropout to
            # quantify its (B,H,T,T) mask cost
            "attention_dropout_keep_prob":
                float(os.environ.get("BENCH_ATTN_KEEP", "0.9")),
            # BENCH_FLASH=1 fuses attention scores/softmax/context into
            # the Pallas flash kernel (rel term as additive bias; no
            # attention-weight dropout on that path)
            "flash_attention":
                os.environ.get("BENCH_FLASH", "0") == "1",
            # BENCH_FUSED=1 routes the conv module through the fused
            # Pallas kernel (ops/conformer_pallas.py)
            "fused_conv_module":
                os.environ.get("BENCH_FUSED", "0") == "1",
        },
        "decoder": FullyConnectedCTCDecoder,
        "decoder_params": {"use_language_model": False},
        "loss": CTCLoss,
        "loss_params": {"use_pallas": True},
        "data_layer": SyntheticSpeechDataLayer,
        "data_layer_params": {
            "num_audio_features": 80,
            "tgt_vocab_size": 29,
            "time_steps": time_steps,
            "label_length": 160,
            "num_batches": 8,
        },
    }
    remat = os.environ.get("BENCH_REMAT", "")
    if remat:
        params["remat"] = True if remat == "true" else remat
    if os.environ.get("BENCH_MOMENTS"):
        params["optimizer_params"]["moments_dtype"] = \
            os.environ["BENCH_MOMENTS"]
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

    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step_fn(state, device_batch, rng)
    float(jax.device_get(metrics["loss"]))
    wall = time.time() - t0

    utt_per_sec_per_chip = n_steps * batch_per_chip / wall
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)

    mfu = None
    try:
        cost = step_fn.lower(state, device_batch,
                             rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = flops * n_steps / wall / (197e12 * n_chips)
    except Exception:
        pass

    result = {
        "metric": "conformer_%s_train_utt_per_sec_per_chip" % scale,
        "value": round(utt_per_sec_per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec_per_chip /
                             V100_BASELINE_UTT_PER_SEC, 3),
        "baseline_citation": (
            "same ~32 utt/s/V100 Jasper AMP figure as bench.py "
            "(NVIDIA DeepLearningExamples); no Conformer exists in "
            "the reference to compare against directly"),
        "batch_per_chip": batch_per_chip,
    }
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
