#!/usr/bin/env python
"""Benchmark: Conformer-Transducer (RNN-T) training throughput
(beyond-parity model; the reference predates the RNN-T production era,
so vs_baseline compares against the SAME ~32 utt/s/V100 Jasper figure
bench.py uses — both are LibriSpeech ASR training recipes).

Prints ONE JSON line like the other benches:
  {"metric": "conformer_rnnt_train_utt_per_sec_per_chip", ...}

Input: synthetic ~10 s utterances (T=1000 logfbank frames @10 ms,
U=160 labels), bf16 "mixed", AdamW + noam schedule, rbg dropout keys,
u8 masks — the shipped `conformer_transducer_LibriSpeech.py`
configuration on synthetic batches (pure step time, no host IO).

Usage: [BENCH_BS=32] [BENCH_FUSED=1] python scripts/bench_transducer.py
  BENCH_FUSED=0 benchmarks the materialized-lattice loss for the
  fused-vs-unfused comparison row in PARITY.md.
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
    from openseq2seq_tpu.decoders import TransducerDecoder
    from openseq2seq_tpu.encoders import ConformerEncoder
    from openseq2seq_tpu.losses import TransducerLoss
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.parallel.mesh import (make_mesh,
                                               replicated_sharding,
                                               shard_batch)

    n_chips = len(jax.devices())
    batch_per_chip = int(os.environ.get("BENCH_BS", "128"))
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    time_steps = int(os.environ.get("BENCH_T", "1000"))
    label_len = int(os.environ.get("BENCH_U", "160"))

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
        "lr_policy_params": {"learning_rate": 2.0, "d_model": 256,
                             "warmup_steps": 10000},
        "dtype": "mixed",
        "max_grad_norm": 5.0,
        "prng_impl": "rbg",
        "dropout_bits": int(os.environ.get("BENCH_DROPBITS", "8")),
        "remat": {"": False, "true": True}.get(
            os.environ.get("BENCH_REMAT", "blocks"),
            os.environ.get("BENCH_REMAT", "blocks")),
        "encoder": ConformerEncoder,
        "encoder_params": {
            "num_layers": 16,
            "hidden_size": 256,
            "num_heads": 4,
            "conv_kernel_size": 31,
            "ffn_expansion": 4,
            "dropout_keep_prob": 0.9,
            "attention_dropout_keep_prob": 0.9,
        },
        "decoder": TransducerDecoder,
        "decoder_params": {
            "pred_embed_size": 320,
            "pred_units": 320,
            "pred_layers": 1,
            "joint_dim": 320,
            "dropout_keep_prob": 0.9,
            "max_symbols_per_frame": 3,
            "fused_loss": fused,
        },
        "loss": TransducerLoss,
        "loss_params": {
            "fused_block_size": int(os.environ.get("BENCH_BLOCK", "8")),
        },
        "data_layer": SyntheticSpeechDataLayer,
        "data_layer_params": {
            "num_audio_features": 80,
            "tgt_vocab_size": 29,
            "time_steps": time_steps,
            "label_length": label_len,
            "num_batches": 8,
        },
    }
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
        "metric": "conformer_rnnt_train_utt_per_sec_per_chip",
        "value": round(utt_per_sec_per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec_per_chip /
                             V100_BASELINE_UTT_PER_SEC, 3),
        "baseline_citation": (
            "same ~32 utt/s/V100 Jasper AMP figure as bench.py "
            "(NVIDIA DeepLearningExamples); the reference has no "
            "RNN-T to compare against directly"),
        "batch_per_chip": batch_per_chip,
        "fused_loss": fused,
    }
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
