#!/usr/bin/env python
"""Benchmark: Tacotron-2 training throughput on synthetic LJ-shape
batches.

Times the jitted Text2Speech train step at the flagship recipe's
hyperparameters (`example_configs/text2speech/tacotron_LJ.py`: bs48,
Adam, "mixed" dtype, 512-unit encoder convs + BiLSTM, 2x1024 LSTM
decoder with location-sensitive attention + prenet/postnet) on
synthetic batches shaped like LJSpeech (~6 s utterances: T=512 mel
frames @ 80 bins, 96-char transcripts) and prints one JSON line with
utterances/s/chip and mel frames/s/chip.

Baseline context: the reference publishes NO TTS throughput or quality
table (BASELINE.md last row — audio samples + checkpoints only), so
vs_baseline is null; the number documents our own progression.

The decoder is an inherently sequential T-step scan (teacher-forced
autoregression, `decoders/tacotron2_decoder.py`), so per-step device
time is dominated by the scan's small matmuls — the classic
low-arithmetic-intensity RNN regime. MFU is reported for context but
the honest capacity metric is frames/s.

Usage: [BENCH_BS=48] [BENCH_T=512] python scripts/bench_tacotron.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12


def main():
    import jax

    from openseq2seq_tpu.data.synthetic import SyntheticTTSDataLayer
    from openseq2seq_tpu.decoders import Tacotron2Decoder
    from openseq2seq_tpu.encoders import Tacotron2Encoder
    from openseq2seq_tpu.losses import Text2SpeechLoss
    from openseq2seq_tpu.models import Text2Speech
    from openseq2seq_tpu.parallel.mesh import (make_mesh, shard_batch,
                                               tp_state_sharding)
    from openseq2seq_tpu.utils.benchmark import (time_chained_steps,
                                                 train_step_flops)

    bs = int(os.environ.get("BENCH_BS", "48"))
    spec_T = int(os.environ.get("BENCH_T", "512"))
    n_chips = len(jax.devices())
    mesh = make_mesh(num_data=n_chips, num_model=1)

    params = {
        "random_seed": 0,
        "max_steps": 1000000,
        "batch_size_per_gpu": bs,
        "print_loss_steps": None,
        "optimizer": "Adam",
        "optimizer_params": {"learning_rate": 1e-3},
        "lr_policy": "exp_decay",
        "lr_policy_params": {
            "decay_steps": 20000, "decay_rate": 0.1,
            "use_staircase_decay": False, "begin_decay_at": 45000,
            "min_lr": 1e-5,
        },
        "dtype": "mixed",
        "max_grad_norm": 1.0,
        "encoder": Tacotron2Encoder,
        "encoder_params": {
            "cnn_dropout_prob": 0.5,
            "rnn_dropout_prob": 0.1,
            "src_emb_size": 512,
            "conv_layers": [
                {"kernel_size": [5], "stride": [1],
                 "num_channels": 512, "padding": "SAME"},
                {"kernel_size": [5], "stride": [1],
                 "num_channels": 512, "padding": "SAME"},
                {"kernel_size": [5], "stride": [1],
                 "num_channels": 512, "padding": "SAME"},
            ],
            "activation_fn": "relu",
            "num_rnn_layers": 1,
            "rnn_cell_dim": 256,
            "use_cudnn_rnn": True,
            "rnn_type": "lstm",
            "rnn_unidirectional": False,
            "zoneout_prob": 0.1,
        },
        "decoder": Tacotron2Decoder,
        "decoder_params": {
            "attention_layer_size": 128,
            "attention_type": "location",
            "decoder_cell_units": 1024,
            "decoder_cell_type": "lstm",
            "decoder_layers": 2,
            "enable_prenet": True,
            "prenet_layers": 2,
            "prenet_units": 256,
            "enable_postnet": True,
            "zoneout_prob": 0.1,
            "dropout_prob": 0.1,
            "mask_decoder_sequence": True,
            "infer_max_steps": 1000,
            # reduction factor sweep: BENCH_R=2/4 batches r frames per
            # autoregressive step (the 0.036-MFU bound is scan length)
            "outputs_per_step": int(os.environ.get("BENCH_R", "1")),
        },
        "loss": Text2SpeechLoss,
        "loss_params": {"use_mask": True},
        "data_layer": SyntheticTTSDataLayer,
        "data_layer_params": {
            "src_vocab_size": 64,
            "num_audio_features": 80,
            "text_length": 96,
            "spec_length": spec_T,
            "num_batches": 4,
        },
    }
    model = Text2Speech(params=params, mode="train", mesh=mesh)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, tp_state_sharding(state, mesh))
    device_batch = shard_batch(batch, mesh)

    rng = jax.random.PRNGKey(0)
    step_flops = train_step_flops(model, state, device_batch, rng)
    wall, n_steps, state = time_chained_steps(
        model, state, device_batch, rng,
        chain=int(os.environ.get("BENCH_CHAIN", "10")),
        calls=int(os.environ.get("BENCH_STEPS", "3")))

    utt_per_sec_chip = n_steps * bs / wall
    frames_per_sec_chip = utt_per_sec_chip * spec_T
    mfu = (step_flops / (wall / n_steps) / V5E_BF16_FLOPS
           if step_flops else None)

    print(json.dumps({
        "metric": "tacotron2_train_utt_per_sec_per_chip",
        "value": round(utt_per_sec_chip, 1),
        "unit": "utt/s/chip",
        "vs_baseline": None,
        "note": "reference publishes no TTS throughput figure "
                "(BASELINE.md)",
        "mel_frames_per_sec_per_chip": round(frames_per_sec_chip, 0),
        "batch_per_chip": bs,
        "spec_frames": spec_T,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
