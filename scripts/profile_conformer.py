#!/usr/bin/env python
"""Per-op device-time profile of the Conformer-M CTC train step.

Same method as `profile_decode.py` (jax.profiler trace -> chrome-trace
parse -> top HLO ops by device time): identifies WHERE the
VPU/norm-bound M-scale step (MFU 0.137 at bs128) actually spends its
time, so the fusion work targets the real bottleneck instead of the
assumed one.

Usage: [BENCH_BS=128] [BENCH_FUSED=0] python scripts/profile_conformer.py
"""
from __future__ import annotations

import collections
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_decode import categorize, parse_trace  # noqa: E402


def main():
    import jax
    from openseq2seq_tpu.data.synthetic import SyntheticSpeechDataLayer
    from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder
    from openseq2seq_tpu.encoders import ConformerEncoder
    from openseq2seq_tpu.losses import CTCLoss
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.parallel.mesh import (make_mesh,
                                               replicated_sharding,
                                               shard_batch)

    bs = int(os.environ.get("BENCH_BS", "128"))
    fused = os.environ.get("BENCH_FUSED", "0") == "1"
    mesh = make_mesh(num_data=len(jax.devices()), num_model=1)
    params = {
        "random_seed": 0, "use_horovod": False, "max_steps": 10**6,
        "logdir": "", "batch_size_per_gpu": bs,
        "print_loss_steps": 10**9,
        "optimizer": "AdamW",
        "optimizer_params": {"learning_rate": 2.0, "beta1": 0.9,
                             "beta2": 0.98, "epsilon": 1e-9,
                             "weight_decay": 1e-6},
        "lr_policy": "transformer_policy",
        "lr_policy_params": {"learning_rate": 2.0, "d_model": 256,
                             "warmup_steps": 10000},
        "dtype": "mixed", "max_grad_norm": 5.0,
        "prng_impl": "rbg", "dropout_bits": 8,
        "encoder": ConformerEncoder,
        "encoder_params": {
            "num_layers": 16, "hidden_size": 256, "num_heads": 4,
            "conv_kernel_size": 31, "ffn_expansion": 4,
            "dropout_keep_prob": 0.9,
            "attention_dropout_keep_prob": 0.9,
            "fused_conv_module": fused,
        },
        "decoder": FullyConnectedCTCDecoder,
        "decoder_params": {"use_language_model": False},
        "loss": CTCLoss, "loss_params": {"use_pallas": True},
        "data_layer": SyntheticSpeechDataLayer,
        "data_layer_params": {
            "num_audio_features": 80, "tgt_vocab_size": 29,
            "time_steps": 1000, "label_length": 160, "num_batches": 8,
        },
    }
    model = Speech2Text(params=params, mode="train", mesh=mesh)
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    device_batch = shard_batch(batch, mesh)
    step_fn = jax.jit(model.train_step, donate_argnums=(0,))
    rng = jax.random.key(0, impl="rbg")

    for _ in range(3):
        state, metrics = step_fn(state, device_batch, rng)
    float(jax.device_get(metrics["loss"]))

    trace_dir = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="conformer_trace_")
    jax.profiler.start_trace(trace_dir)
    state, metrics = step_fn(state, device_batch, rng)
    float(jax.device_get(metrics["loss"]))
    jax.profiler.stop_trace()

    per_op = parse_trace(trace_dir)
    per_cat = collections.Counter()
    for name, dur in per_op.items():
        per_cat[categorize(name)] += dur
    total = sum(per_cat.values())
    print(json.dumps({
        "metric": "conformer_m_train_step_device_time_by_category_ms",
        "fused_conv_module": fused, "batch_per_chip": bs,
        "total_ms": round(total / 1e3, 2),
        "categories_ms": {k: round(v / 1e3, 2)
                          for k, v in per_cat.most_common()},
        "trace_dir": trace_dir,
    }))
    print("top 40 ops by total device time:", file=sys.stderr)
    for name, dur in per_op.most_common(40):
        print(f"  {dur/1e3:9.2f} ms  {name[:120]}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
