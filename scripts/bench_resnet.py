#!/usr/bin/env python
"""Benchmark: ResNet-50 v2 ImageNet-shape training throughput.

Times the jitted Image2Label train step (NovoGrad recipe,
`example_configs/image2label/resnet50_v2_imagenet.py` hyperparameters)
on synthetic 224x224 batches and prints one JSON line with
images/s/chip and MFU.

Baseline context: the reference publishes no absolute image/s table
(BASELINE.md "Notes" — throughput exists only as the built-in
objects/s harness), so vs_baseline uses the widely reproduced V100
mixed-precision ResNet-50 training figure of ~400 images/s/GPU (the
same class of public number the Jasper bench's 32 utt/s/V100 anchor
comes from).

MFU: analytic fwd FLOPs for ResNet-50 at 224x224 are ~4.1 GFLOP/image
(~8.2 MAC-derived); training approximates 3x fwd. We compute the exact
cost from XLA's cost analysis like bench.py does.

Usage: [BENCH_BS=128] python scripts/bench_resnet.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V100_IMAGES_PER_SEC = 400.0
V5E_BF16_FLOPS = 197e12


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
    n_chips = len(jax.devices())
    mesh = make_mesh(num_data=n_chips, num_model=1)

    params = {
        "random_seed": 0,
        "max_steps": 1000000,
        "batch_size_per_gpu": bs,
        "print_loss_steps": None,
        "optimizer": "NovoGrad",
        "optimizer_params": {"beta1": 0.95, "beta2": 0.98,
                             "epsilon": 1e-8, "weight_decay": 0.001,
                             "grad_averaging": False},
        "lr_policy": "cosine_decay",
        "lr_policy_params": {"learning_rate": 0.02,
                             "warmup_steps": 5000,
                             "decay_steps": 1000000, "min_lr": 0.0},
        "dtype": "mixed",
        "encoder": ResNetEncoder,
        "encoder_params": {"resnet_size": 50, "version": 2,
                           "regularize_bn": False},
        "decoder": FullyConnectedDecoder,
        "decoder_params": {"output_dim": 1000},
        "loss": CrossEntropyLoss,
        "loss_params": {},
        "data_layer": SyntheticImageDataLayer,
        "data_layer_params": {"num_classes": 1000, "image_size": 224,
                              "num_batches": 4},
    }
    model = Image2Label(params=params, mode="train", mesh=mesh)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, tp_state_sharding(state, mesh))
    device_batch = shard_batch(batch, mesh)

    # the device step is ~40 ms — far below the remote relay's
    # per-dispatch latency, so a per-dispatch timing loop measures the
    # relay, not the chip (measured 1.09 s/step dispatched vs 42 ms
    # device time in scripts/profile_resnet.py). Chain K steps inside
    # ONE jitted program instead (utils/benchmark.py).
    from openseq2seq_tpu.utils.benchmark import (time_chained_steps,
                                                 train_step_flops)

    rng = jax.random.PRNGKey(0)
    step_flops = train_step_flops(model, state, device_batch, rng)
    wall, n_steps, state = time_chained_steps(
        model, state, device_batch, rng,
        chain=int(os.environ.get("BENCH_CHAIN", "20")),
        calls=int(os.environ.get("BENCH_STEPS", "3")))

    imgs_per_sec_chip = n_steps * bs / wall
    mfu = (step_flops * n_chips * imgs_per_sec_chip /
           (bs * n_chips) / V5E_BF16_FLOPS) if step_flops else None

    print(json.dumps({
        "metric": "resnet50v2_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec_chip, 1),
        "unit": "images/s/chip",
        "vs_baseline": round(imgs_per_sec_chip / V100_IMAGES_PER_SEC, 2),
        "batch_per_chip": bs,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
