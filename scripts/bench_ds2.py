#!/usr/bin/env python
"""Benchmark: DeepSpeech2 training throughput (ds2_medium shapes:
conv2d front end + 3x1024 bidirectional GRU + FC; reference
`ds2_medium_4gpus.py`, published greedy WER 6.71).

The GRU stack is the interesting part: this is the bench for the fused
Pallas GRU scan (`ops/gru_pallas.py`; BENCH_FUSED_RNN=0 measures the
lax.scan control).

Usage: [BENCH_BS=32] [BENCH_FUSED_RNN=1] python scripts/bench_ds2.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V100_BASELINE_UTT_PER_SEC = 32.0
V5E_BF16_FLOPS = 197e12


def main():
    import jax

    from openseq2seq_tpu.data.synthetic import SyntheticSpeechDataLayer
    from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder
    from openseq2seq_tpu.encoders import DeepSpeech2Encoder
    from openseq2seq_tpu.losses import CTCLoss
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.parallel.mesh import (make_mesh,
                                               replicated_sharding,
                                               shard_batch)
    from openseq2seq_tpu.utils.benchmark import (time_chained_steps,
                                                 train_step_flops)

    n_chips = len(jax.devices())
    bs = int(os.environ.get("BENCH_BS", "32"))
    time_steps = int(os.environ.get("BENCH_T", "1000"))
    mesh = make_mesh(num_data=n_chips, num_model=1)
    params = {
        "random_seed": 0,
        "max_steps": 1000000,
        "logdir": "",
        "batch_size_per_gpu": bs,
        "print_loss_steps": None,
        "optimizer": "Adam",
        "optimizer_params": {"learning_rate": 1e-4},
        "dtype": "mixed",
        "max_grad_norm": 5.0,
        "prng_impl": "rbg",
        "dropout_bits": 8,
        "fused_rnn": os.environ.get("BENCH_FUSED_RNN", "1") == "1",
        "encoder": DeepSpeech2Encoder,
        "encoder_params": {
            "conv_layers": [
                {"kernel_size": [11, 41], "stride": [2, 2],
                 "num_channels": 32, "padding": "SAME"},
                {"kernel_size": [11, 21], "stride": [1, 2],
                 "num_channels": 64, "padding": "SAME"},
                {"kernel_size": [11, 21], "stride": [1, 2],
                 "num_channels": 96, "padding": "SAME"},
            ],
            "num_rnn_layers": 3,
            "rnn_cell_dim": 1024,
            "use_cudnn_rnn": True,
            "rnn_type": "cudnn_gru",
            "rnn_unidirectional": False,
            "row_conv": False,
            "n_hidden": 1024,
            "dropout_keep_prob": 0.5,
            "activation_fn": jax.nn.relu,
        },
        "decoder": FullyConnectedCTCDecoder,
        "decoder_params": {"use_language_model": False},
        "loss": CTCLoss,
        "loss_params": {"use_pallas": True},
        "data_layer": SyntheticSpeechDataLayer,
        "data_layer_params": {
            "num_audio_features": 160,
            "tgt_vocab_size": 29,
            "time_steps": time_steps,
            "label_length": 160,
            "num_batches": 4,
        },
    }
    model = Speech2Text(params=params, mode="train", mesh=mesh)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    device_batch = shard_batch(batch, mesh)

    rng = jax.random.key(0, impl="rbg")
    step_flops = train_step_flops(model, state, device_batch, rng)
    wall, n_steps, state = time_chained_steps(
        model, state, device_batch, rng,
        chain=int(os.environ.get("BENCH_CHAIN", "10")),
        calls=int(os.environ.get("BENCH_STEPS", "3")))

    utt = n_steps * bs / wall
    mfu = (step_flops / (wall / n_steps) / V5E_BF16_FLOPS
           if step_flops else None)
    print(json.dumps({
        "metric": "ds2_medium_train_utt_per_sec_per_chip",
        "value": round(utt, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt / V100_BASELINE_UTT_PER_SEC, 3),
        "baseline_citation": (
            "same ~32 utt/s/V100 Jasper AMP anchor as bench.py "
            "(no published DS2 throughput; reference publishes WER "
            "6.71 only)"),
        "batch_per_chip": bs,
        "fused_rnn": params["fused_rnn"],
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
