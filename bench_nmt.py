#!/usr/bin/env python
"""Benchmark: Transformer-big NMT training throughput on the available
chip(s).

Prints ONE JSON line:
  {"metric": "transformer_big_train_tokens_per_sec_per_chip",
   "value": N, "unit": "tokens/s/chip", "vs_baseline": N / 25000.0}

Baseline: the reference publishes only scaling plots for its
transformer (`docs/sources/source/machine-translation/
transformer_scaling.png`). The per-V100 figure used here comes from
public NVIDIA/fairseq Transformer-big WMT En-De training numbers:
~190-200k source+target tokens/s on a DGX-1 (8x V100 16G, fp16)
=> ~25k tokens/s per V100 (NVIDIA DeepLearningExamples
PyTorch/Translation/Transformer README table). vs_baseline is
tokens/sec/chip vs that assumed 25k/V100.

Setup mirrors transformer-big (`example_configs/text2text/en-de/
transformer-big.py`: 6+6 layers, d_model 1024, 16 heads, ffn 4096,
32k shared vocab), bf16 "mixed", sequence length 64+64 (typical WMT
bucketed batch shape), tokens counted as source+target like the
reference's objects/sec (`models/text2text.py:227-230`).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

V100_BASELINE_TOKENS_PER_SEC = 25000.0


def main():
    import jax
    from openseq2seq_tpu.data.synthetic import SyntheticTextDataLayer
    from openseq2seq_tpu.decoders import TransformerDecoder
    from openseq2seq_tpu.encoders import TransformerEncoder
    from openseq2seq_tpu.losses import PaddedCrossEntropyLossWithSmoothing
    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.parallel.mesh import (make_mesh,
                                               replicated_sharding,
                                               shard_batch)

    import os
    n_chips = len(jax.devices())
    # bs sweepable for tuning runs: BENCH_NMT_BS=128 python bench_nmt.py
    batch_per_chip = int(os.environ.get("BENCH_NMT_BS", "64"))
    # Fused flash attention is OPT-IN: measured on v5e at these shapes
    # (T<=512, bf16) the jax-shipped Pallas kernel is ~2x slower
    # fwd+bwd than XLA's fused plain attention — its win is O(T) memory
    # (no (B,H,T,T) scores), which only pays at long sequence lengths.
    FLASH = os.environ.get("BENCH_NMT_FLASH", "0") == "1"
    # diagnostic: BENCH_NMT_NODROP=1 zeroes all dropout rates to
    # isolate PRNG/mask-generation cost from the matmul path
    DROP = 0.0 if os.environ.get("BENCH_NMT_NODROP") == "1" else 1.0
    # BENCH_NMT_NOATTNDROP=1 zeroes ONLY attention-weight dropout —
    # isolates the (B,H,T,T) mask term from the (B,T,D)-shaped sites
    ADROP = 0.0 if (DROP == 0.0 or
                    os.environ.get("BENCH_NMT_NOATTNDROP") == "1") \
        else 1.0
    # realistic WMT bucketed batches run to T=256; sweep with
    # BENCH_NMT_SEQ=256 BENCH_NMT_BS=16 (keep the token budget ~flat).
    # BENCH_NMT_PADFRAC>0 pads a fraction of each sequence (bucketed
    # corpora have within-bucket padding) so remove_padding is
    # actually exercised; tokens/s counts VALID tokens only.
    seq_len = int(os.environ.get("BENCH_NMT_SEQ", "64"))
    pad_frac = float(os.environ.get("BENCH_NMT_PADFRAC", "0"))
    # u8 threshold dropout masks (quarter the RNG volume; see
    # parts/dropout.py): measured 140.2k -> 145.3k tokens/s at T=64 and
    # 115.2k -> 127.3k (MFU 0.434 -> 0.479) at T=256/pad10%; ships in
    # the transformer recipes. Sweep with BENCH_NMT_DROPBITS=32.
    drop_bits = int(os.environ.get("BENCH_NMT_DROPBITS", "8"))
    # key-only dropout residuals (parts/dropout.py): measured a WASH
    # for speed at T=256/bs16 (125.5k tok/s remat vs 126.3k stored) —
    # u8 masks are cheap enough that the regen VPU work cancels the
    # residual traffic saved. Kept opt-in as a MEMORY lever
    # (BENCH_NMT_DROPREMAT=1).
    drop_remat = os.environ.get("BENCH_NMT_DROPREMAT", "0") == "1"
    # Pallas dropout(+residual) kernels: mask drawn from the TPU
    # hardware PRNG inside the kernel, never written to HBM
    # (ops/dropout_pallas.py). Sweep with BENCH_NMT_FUSEDDROP=1.
    fused_drop = os.environ.get("BENCH_NMT_FUSEDDROP", "0") == "1"
    d_model = 1024

    mesh = make_mesh(num_data=n_chips, num_model=1)
    # rbg: dropout masks from the TPU-accelerated RngBitGenerator
    # instead of threefry (measured 88.7k -> 152.5k tokens/s/chip with
    # dropout off entirely — mask generation dominates under threefry)
    prng_impl = os.environ.get("BENCH_NMT_PRNG", "rbg")
    params = {
        "random_seed": 0,
        "max_steps": 1000000,
        "prng_impl": prng_impl,
        "dropout_bits": drop_bits,
        "dropout_remat": drop_remat,
        "fused_residual_dropout": fused_drop,
        "batch_size_per_gpu": batch_per_chip,
        "print_loss_steps": None,
        "optimizer": "NovoGrad",
        "optimizer_params": {"beta1": 0.95, "beta2": 0.99,
                             "weight_decay": 1e-4},
        "lr_policy": "transformer_policy",
        "lr_policy_params": {"learning_rate": 2.0, "warmup_steps": 8000,
                             "d_model": d_model},
        "dtype": "mixed",
        "encoder": TransformerEncoder,
        "encoder_params": {
            "encoder_layers": 6,
            "hidden_size": d_model,
            "num_heads": 16,
            "attention_dropout": 0.1 * ADROP,
            "filter_size": 4 * d_model,
            "relu_dropout": 0.3 * DROP,
            "layer_postprocess_dropout": 0.3 * DROP,
            "remove_padding": True,
            "use_flash_attention": FLASH,
        },
        "decoder": TransformerDecoder,
        "decoder_params": {
            "EOS_ID": 1,
            "GO_SYMBOL": 2,
            "layer_postprocess_dropout": 0.3 * DROP,
            "num_hidden_layers": 6,
            "hidden_size": d_model,
            "num_heads": 16,
            "attention_dropout": 0.1 * ADROP,
            "relu_dropout": 0.3 * DROP,
            "filter_size": 4 * d_model,
            "beam_size": 4,
            "alpha": 0.6,
            "extra_decode_length": 50,
            "use_flash_attention": FLASH,
        },
        "loss": PaddedCrossEntropyLossWithSmoothing,
        "loss_params": {"label_smoothing": 0.1},
        "data_layer": SyntheticTextDataLayer,
        "data_layer_params": {
            "src_vocab_size": 32768,
            "tgt_vocab_size": 32768,
            "src_length": seq_len,
            "tgt_length": seq_len,
            "pad_fraction": pad_frac,
            "num_batches": 4,
        },
    }
    model = Text2Text(params=params, mode="train", mesh=mesh)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    tokens_per_step = model.get_num_objects_per_step(batch)
    state = model.init_state(batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    device_batch = shard_batch(batch, mesh)
    step_fn = jax.jit(model.train_step, donate_argnums=(0,))
    rng = jax.random.key(0, impl=prng_impl) if prng_impl \
        else jax.random.PRNGKey(0)

    for _ in range(3):
        state, metrics = step_fn(state, device_batch, rng)
    float(jax.device_get(metrics["loss"]))

    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step_fn(state, device_batch, rng)
    float(jax.device_get(metrics["loss"]))
    wall = time.time() - t0

    tokens_per_sec_per_chip = n_steps * tokens_per_step / wall / n_chips
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)

    # MFU vs the v5e 197 TFLOP/s bf16 peak (as in bench.py)
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
        "metric": "transformer_big_train_tokens_per_sec_per_chip",
        "seq_len": seq_len,
        "batch_per_chip": batch_per_chip,
        "pad_fraction": pad_frac,
        "dropout_bits": drop_bits,
        "value": round(tokens_per_sec_per_chip, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tokens_per_sec_per_chip /
                             V100_BASELINE_TOKENS_PER_SEC, 3),
    }
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
