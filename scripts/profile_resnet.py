#!/usr/bin/env python
"""Per-op profile of the ResNet-50 v2 train step (companion to
``scripts/bench_resnet.py`` — same program, one traced execution).

Usage: [BENCH_BS=128] python scripts/profile_resnet.py
"""
from __future__ import annotations

import collections
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from profile_decode import categorize, parse_trace  # noqa: E402


def main():
    import jax
    import numpy as np

    from openseq2seq_tpu.data.synthetic import SyntheticImageDataLayer
    from openseq2seq_tpu.decoders import FullyConnectedDecoder
    from openseq2seq_tpu.encoders import ResNetEncoder
    from openseq2seq_tpu.losses import CrossEntropyLoss
    from openseq2seq_tpu.models import Image2Label
    from openseq2seq_tpu.parallel.mesh import (make_mesh, shard_batch,
                                               tp_state_sharding)

    bs = int(os.environ.get("BENCH_BS", "128"))
    mesh = make_mesh(num_data=len(jax.devices()), num_model=1)
    params = {
        "random_seed": 0, "max_steps": 1000000,
        "batch_size_per_gpu": bs, "print_loss_steps": None,
        "optimizer": "NovoGrad",
        "optimizer_params": {"beta1": 0.95, "beta2": 0.98,
                             "epsilon": 1e-8, "weight_decay": 0.001,
                             "grad_averaging": False},
        "lr_policy": "cosine_decay",
        "lr_policy_params": {"learning_rate": 0.02,
                             "warmup_steps": 5000,
                             "decay_steps": 1000000, "min_lr": 0.0},
        "dtype": os.environ.get("BENCH_DTYPE", "mixed"),
        "encoder": ResNetEncoder,
        "encoder_params": {"resnet_size": 50, "version": 2,
                           "regularize_bn": False},
        "decoder": FullyConnectedDecoder,
        "decoder_params": {"output_dim": 1000},
        "loss": CrossEntropyLoss, "loss_params": {},
        "data_layer": SyntheticImageDataLayer,
        "data_layer_params": {"num_classes": 1000, "image_size": 224,
                              "num_batches": 4},
    }
    model = Image2Label(params=params, mode="train", mesh=mesh)
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, tp_state_sharding(state, mesh))
    db = shard_batch(batch, mesh)

    step = jax.jit(model.train_step)
    state2, metrics = step(state, db, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics["loss"])

    trace_dir = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="resnet_trace_")
    jax.profiler.start_trace(trace_dir)
    _, metrics = step(state, db, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    per_op = parse_trace(trace_dir)
    per_cat = collections.Counter()
    for name, dur in per_op.items():
        per_cat[categorize(name)] += dur
    total = sum(per_cat.values())
    print(json.dumps({
        "metric": "resnet_step_device_time_by_category_ms",
        "total_ms": round(total / 1e3, 2),
        "categories_ms": {k: round(v / 1e3, 2)
                          for k, v in per_cat.most_common()},
        "trace_dir": trace_dir,
    }))
    print("top 25 ops by total device time:", file=sys.stderr)
    for name, dur in per_op.most_common(25):
        print(f"  {dur/1e3:9.2f} ms  {name[:110]}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
