#!/usr/bin/env python
"""Benchmark: LSTM language-model training throughput (WikiText-103
recipe shapes).

Times the jitted LSTMLM train step at the flagship recipe's
hyperparameters (`example_configs/lm/lstm_wkt103.py`: bs224, bptt 96,
~268k vocab, 320-dim embedding, 3x1024 scan-LSTM, 8192-candidate
sampled softmax, Adam, "mixed" dtype) on synthetic token tracks and
prints one JSON line with tokens/s/chip.

This exercises the two components the other benches do not: the
scan-LSTM kernels (`parts/rnns/rnn.py`, the cuDNN-RNN replacement) and
the sampled-softmax loss (`losses/sequence_loss.py`) over a huge
embedding table.

Baseline context: the reference publishes LM quality only (ppl 48.6,
BASELINE.md); no throughput figure exists, so vs_baseline is null.

Window note (chip_queue25): the default 30-step timed window trains to
a finite loss; >=60-step windows over the REPEATED synthetic batch go
non-finite on TPU — identically on the lax.scan and fused paths (the
fused kernels are output- and gradient-validated against the scan on
hardware, scripts/validate_fused_rnn_tpu.py), and the same setup is
stable >=70 steps on CPU — a synthetic-overfit artifact of this bench,
not a kernel or recipe property. The harness asserts finite loss so a
window change cannot silently time garbage.

Usage: [BENCH_BS=224] [BENCH_BPTT=96] python scripts/bench_lm.py
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

    from openseq2seq_tpu.data.synthetic import SyntheticLMDataLayer
    from openseq2seq_tpu.decoders import FakeDecoder
    from openseq2seq_tpu.encoders import LMEncoder
    from openseq2seq_tpu.losses import BasicSampledSequenceLoss
    from openseq2seq_tpu.models import LSTMLM
    from openseq2seq_tpu.parallel.mesh import (make_mesh, shard_batch,
                                               tp_state_sharding)
    from openseq2seq_tpu.utils.benchmark import (time_chained_steps,
                                                 train_step_flops)

    bs = int(os.environ.get("BENCH_BS", "224"))
    bptt = int(os.environ.get("BENCH_BPTT", "96"))
    vocab = int(os.environ.get("BENCH_VOCAB", "267744"))  # wkt103,
    # padded to a multiple of eight like WKTDataLayer does
    n_chips = len(jax.devices())
    mesh = make_mesh(num_data=n_chips, num_model=1)

    params = {
        "random_seed": 0,
        "max_steps": 1000000,
        # fused Pallas LSTM scan (ops/lstm_pallas.py), DEFAULT since
        # round 5: measured 264.2k -> 331.1k tokens/s (MFU 0.148 ->
        # 0.226) at these shapes (chip_queue22). BENCH_FUSED_RNN=0
        # measures the lax.scan control.
        "fused_rnn": os.environ.get("BENCH_FUSED_RNN", "1") == "1",
        "batch_size_per_gpu": bs,
        "print_loss_steps": None,
        "optimizer": "Adam",
        # 2e-4 (recipe uses 1e-3 on real text): random synthetic
        # tokens make the sampled-softmax loss diverge past ~40 steps
        # at 1e-3 — on BOTH the scan and fused paths identically
        # (chip_queue25) — and the harness now asserts finite loss.
        # Throughput is lr-independent.
        "optimizer_params": {"learning_rate": 2e-4},
        "lr_policy": "exp_decay",
        "lr_policy_params": {"decay_steps": 40000, "decay_rate": 0.9,
                             "use_staircase_decay": True,
                             "begin_decay_at": 100000, "min_lr": 1e-6},
        "max_grad_norm": 0.25,
        "dtype": "mixed",
        "encoder": LMEncoder,
        "encoder_params": {
            "emb_size": 320,
            "encoder_layers": 3,
            "encoder_use_skip_connections": False,
            "core_cell": None,
            "core_cell_params": {"num_units": 1024},
            "use_cudnn_rnn": True,
            "cudnn_rnn_type": "cudnn_lstm",
            "weight_tied": False,
            "num_sampled": 8192,
            "encoder_emb_keep_prob": 0.9,
            "encoder_dp_input_keep_prob": 0.8,
            "encoder_dp_output_keep_prob": 0.8,
            "encoder_last_output_keep_prob": 0.8,
        },
        "decoder": FakeDecoder,
        "decoder_params": {},
        "loss": BasicSampledSequenceLoss,
        "loss_params": {},
        "data_layer": SyntheticLMDataLayer,
        "data_layer_params": {
            "vocab_size": vocab,
            "bptt": bptt,
            "num_batches": 4,
        },
    }
    model = LSTMLM(params=params, mode="train", mesh=mesh)
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

    tokens_per_sec_chip = n_steps * bs * bptt / wall
    mfu = (step_flops / (wall / n_steps) / V5E_BF16_FLOPS
           if step_flops else None)

    print(json.dumps({
        "metric": "lstm_lm_wkt103_train_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec_chip, 0),
        "unit": "tokens/s/chip",
        "vs_baseline": None,
        "note": "reference publishes no LM throughput figure "
                "(BASELINE.md)",
        "batch_per_chip": bs,
        "bptt": bptt,
        "vocab": vocab,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
