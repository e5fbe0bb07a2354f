#!/usr/bin/env python
"""Benchmark: exported-style serving throughput, bf16 vs INT8
activations, on the available chip(s).

The reference ships TF-TRT int8 serving (calibration in
`open_seq2seq/models/model.py:559-696`, engine build + int8 execution
via `tf.experimental.tensorrt`); it publishes no absolute TRT
throughput table, so this bench reports both absolute tokens/s and the
int8-over-bf16 speedup — the number TF-TRT's int8 mode exists to
deliver (NVIDIA advertises ~2x dense-matmul rate for int8 vs fp16 on
Volta/Turing; TPU v5e similarly runs int8 x int8 -> int32 on the MXU
at 2x the bf16 rate, 394 vs 197 TOP/s).

Workload: transformer-base teacher-forced scoring — the serving shape
behind eval loss, n-best rescoring and distillation-teacher scoring.
Encoder + decoder + logits projection, matmul-dominant, no beam
search (the autoregressive decode path has its own bench,
`scripts/bench_nmt_decode.py`, and is HBM-bound, where int8
activations do not pay).

Prints ONE JSON line:
  {"metric": "transformer_scoring_serve_tokens_per_sec_per_chip",
   "value": <bf16 tok/s/chip>, "int8_value": <int8 tok/s/chip>,
   "int8_speedup": ..., "unit": "tokens/s/chip"}

Sweep: BENCH_SERVE_BS / BENCH_SERVE_SEQ / BENCH_SERVE_DMODEL.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import flax.linen as nn

    from openseq2seq_tpu.data.synthetic import SyntheticTextDataLayer
    from openseq2seq_tpu.decoders import TransformerDecoder
    from openseq2seq_tpu.encoders import TransformerEncoder
    from openseq2seq_tpu.losses import PaddedCrossEntropyLossWithSmoothing
    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.serving.int8_exec import (calibrate_dense_inputs,
                                                   make_int8_interceptor)

    n_chips = len(jax.devices())
    bs = int(os.environ.get("BENCH_SERVE_BS", "64"))
    seq_len = int(os.environ.get("BENCH_SERVE_SEQ", "64"))
    d_model = int(os.environ.get("BENCH_SERVE_DMODEL", "512"))
    n_layers = int(os.environ.get("BENCH_SERVE_LAYERS", "6"))

    params = {
        "random_seed": 0,
        "max_steps": 1,
        "batch_size_per_gpu": bs,
        "print_loss_steps": None,
        "optimizer": "SGD",
        "lr_policy": "fixed_lr",
        "lr_policy_params": {"learning_rate": 1e-3},
        "dtype": "mixed",
        "encoder": TransformerEncoder,
        "encoder_params": {
            "encoder_layers": n_layers,
            "hidden_size": d_model,
            "num_heads": d_model // 64,
            "attention_dropout": 0.0,
            "filter_size": 4 * d_model,
            "relu_dropout": 0.0,
            "layer_postprocess_dropout": 0.0,
            "remove_padding": False,
        },
        "decoder": TransformerDecoder,
        "decoder_params": {
            "EOS_ID": 1,
            "GO_SYMBOL": 2,
            "layer_postprocess_dropout": 0.0,
            "num_hidden_layers": n_layers,
            "hidden_size": d_model,
            "num_heads": d_model // 64,
            "attention_dropout": 0.0,
            "relu_dropout": 0.0,
            "filter_size": 4 * d_model,
            "beam_size": 4,
            "alpha": 0.6,
            "extra_decode_length": 8,
        },
        "loss": PaddedCrossEntropyLossWithSmoothing,
        "loss_params": {"label_smoothing": 0.1},
        "data_layer": SyntheticTextDataLayer,
        "data_layer_params": {
            "src_vocab_size": 32768,
            "tgt_vocab_size": 32768,
            "src_length": seq_len,
            "tgt_length": seq_len,
            "num_batches": 2,
        },
    }
    verbose = os.environ.get("BENCH_SERVE_VERBOSE") == "1"

    def note(msg):
        if verbose:
            print(f"[bench_serving +{time.time() - T0:.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    T0 = time.time()
    model = Text2Text(params=params, mode="train")
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    note("init_state")
    state = model.init_state(batch)
    variables = {"params": state.params, **state.model_state}
    rngs = {"dropout": jax.random.PRNGKey(0)}
    # source+target tokens per batch, like the training benches
    tokens_per_batch = bs * 2 * seq_len

    # train=True + zero dropout rates = teacher-forced logits WITHOUT
    # the beam decode that `train=False` appends (the scoring path)
    def fp_serve(b):
        out = model.module().apply(variables, b, train=True, rngs=rngs)
        return out["decoder_output"]["logits"]

    # one-batch calibration over the teacher-forced path (train=True,
    # all rates 0) — skips the eval-mode beam decode, which would run
    # eagerly and dominate wall time over a relayed device link
    note("calibrate")
    calib = jax.tree_util.tree_map(
        lambda x: x[:2] if getattr(x, "ndim", 0) >= 1 else x, batch)
    ranges = calibrate_dense_inputs(model, state, [calib], train=True)
    note(f"calibrated {len(ranges)} layers")
    assert ranges, "calibration found no Dense layers"
    interceptor = make_int8_interceptor(ranges)

    def int8_serve(b):
        with nn.intercept_methods(interceptor):
            out = model.module().apply(variables, b, train=True,
                                       rngs=rngs)
        return out["decoder_output"]["logits"]

    def timed(fn, n_steps=30):
        note("compile+warmup")
        f = jax.jit(fn)
        # this environment's remote-compile relay can drop the pipe on
        # long compiles (transient UNAVAILABLE); retry the first call
        for attempt in range(3):
            try:
                logits = f(batch)
                break
            except Exception as e:  # jax.errors.JaxRuntimeError
                if "UNAVAILABLE" not in str(e) or attempt == 2:
                    raise
                note(f"relay dropped during compile, retrying: {e}")
                time.sleep(20)
        for _ in range(2):
            logits = f(batch)
        np.asarray(jax.device_get(logits[0, 0, :4]))
        t0 = time.time()
        for _ in range(n_steps):
            logits = f(batch)
        np.asarray(jax.device_get(logits[0, 0, :4]))
        wall = time.time() - t0
        return n_steps * tokens_per_batch / wall / n_chips

    fp_tps = timed(fp_serve)
    i8_tps = timed(int8_serve)

    # agreement check: int8 logits track bf16 argmax on the same batch
    l_fp = np.asarray(jax.device_get(jax.jit(fp_serve)(batch)))
    l_i8 = np.asarray(jax.device_get(jax.jit(int8_serve)(batch)))
    agree = float(np.mean(l_fp.argmax(-1) == l_i8.argmax(-1)))

    print(json.dumps({
        "metric": "transformer_scoring_serve_tokens_per_sec_per_chip",
        "batch_per_chip": bs,
        "seq_len": seq_len,
        "d_model": d_model,
        "value": round(fp_tps, 1),
        "int8_value": round(i8_tps, 1),
        "int8_speedup": round(i8_tps / fp_tps, 3),
        "int8_argmax_agreement": round(agree, 4),
        "calibrated_layers": len(ranges),
        "unit": "tokens/s/chip",
    }))


if __name__ == "__main__":
    sys.exit(main())
