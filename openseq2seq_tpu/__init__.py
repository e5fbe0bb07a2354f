"""openseq2seq_tpu — a TPU-native sequence-to-sequence toolkit.

A ground-up JAX/XLA/pjit/Pallas re-design with the capabilities of
NVIDIA/OpenSeq2Seq (TF1): config-driven training/eval/inference of
speech-recognition (CTC), speech-synthesis, machine-translation,
language-modeling, and image-classification models, with first-class
mixed precision (bf16 on TPU; fp16+loss-scaling compatibility mode)
and SPMD data/model parallelism over a `jax.sharding.Mesh`.

Architecture (vs. the reference's graph/session design):
  * components (encoders/decoders/losses/data layers) keep the
    reference's schema'd-params contract (`get_required_params` /
    `get_optional_params`), but forward passes are pure functions of
    (variables, batch) built from flax.linen modules;
  * one jitted train step over a device mesh replaces multi-tower
    replication and Horovod allreduce — gradient reduction is a
    `psum` XLA emits from sharding annotations;
  * the host input pipeline is numpy + threads (no tf.data); audio
    featurization can additionally run on-device.
"""

__version__ = "0.1.0"
