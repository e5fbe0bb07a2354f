#!/usr/bin/env python
"""Benchmark: Conformer-Transducer (RNN-T) batch decode throughput.

Greedy (frame-synchronous scan) by default; BENCH_BEAM=K switches to
the expansion-limited beam search, and BENCH_FUSION=1 adds on-device
n-gram shallow fusion (a toy char LM is estimated on the fly — table
shape, not LM quality, is what the timing exercises).

Input: synthetic ~10 s utterances (T=1000 logfbank frames @10 ms), so
utt/s/chip x 10 = x-real-time throughput (inverse RTF). Prints ONE JSON
line like the other benches. No V100/reference figure exists (the
reference has no RNN-T); vs_baseline reports inverse RTF instead, the
serving-relevant ratio.

Usage: [BENCH_BS=64] [BENCH_BEAM=1] [BENCH_FUSION=0]
       python scripts/bench_transducer_decode.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

UTT_SECONDS = 10.0


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
    batch_per_chip = int(os.environ.get("BENCH_BS", "64"))
    beam = int(os.environ.get("BENCH_BEAM", "1"))
    fusion = os.environ.get("BENCH_FUSION", "0") == "1"
    time_steps = int(os.environ.get("BENCH_T", "1000"))

    decoder_params = {
        "pred_embed_size": 320, "pred_units": 320, "pred_layers": 1,
        "joint_dim": 320, "max_symbols_per_frame": 3,
        "beam_width": beam,
    }
    if fusion:
        import tempfile
        from openseq2seq_tpu.ops.ngram_fusion import build_label_lm
        labels = [chr(ord("a") + i) for i in range(26)] + [" ", "'"]
        rng = np.random.RandomState(0)
        sents = ["".join(rng.choice(labels, 12)) for _ in range(200)]
        arpa = os.path.join(tempfile.mkdtemp(), "fusion.arpa")
        build_label_lm(sents, arpa, order=3)
        vocab = os.path.join(os.path.dirname(arpa), "vocab.txt")
        with open(vocab, "w") as f:
            f.write("".join(c + "\n" for c in labels))
        decoder_params.update({
            "lm_fusion_arpa": arpa, "lm_fusion_weight": 0.3,
            "lm_fusion_beta": 0.1, "alphabet_config_path": vocab,
        })

    mesh = make_mesh(num_data=n_chips, num_model=1)
    params = {
        "random_seed": 0, "use_horovod": False, "max_steps": 10,
        "logdir": "", "batch_size_per_gpu": batch_per_chip,
        "print_loss_steps": 10**9,
        "optimizer": "AdamW", "optimizer_params": {"learning_rate": 1e-3},
        "dtype": "mixed",
        "encoder": ConformerEncoder,
        "encoder_params": {
            "num_layers": 16, "hidden_size": 256, "num_heads": 4,
            "conv_kernel_size": 31, "ffn_expansion": 4,
        },
        "decoder": TransducerDecoder,
        "decoder_params": decoder_params,
        "loss": TransducerLoss,
        "loss_params": {},
        "data_layer": SyntheticSpeechDataLayer,
        "data_layer_params": {
            "num_audio_features": 80,
            # vocab must match the fusion alphabet (28 labels + blank)
            "tgt_vocab_size": 29,
            "time_steps": time_steps, "label_length": 160,
            "num_batches": 4,
        },
    }
    model = Speech2Text(params=params, mode="infer", mesh=mesh)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    # decode only: drop targets so the module skips the training lattice
    batch = {k: v for k, v in batch.items() if k != "target_tensors"}
    device_batch = shard_batch(batch, mesh)

    infer_fn = jax.jit(model.eval_step)

    for _ in range(2):
        out = infer_fn(state, device_batch)
    # device_get, not block_until_ready: over the remote-relay PJRT
    # backend block_until_ready can return before remote execution
    # completes — a host transfer is the only reliable fence
    jax.device_get(jax.tree_util.tree_leaves(out)[0])

    n_steps = 10
    t0 = time.time()
    for _ in range(n_steps):
        out = infer_fn(state, device_batch)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    wall = time.time() - t0

    utt_per_sec_per_chip = n_steps * batch_per_chip / wall
    inv_rtf = utt_per_sec_per_chip * UTT_SECONDS
    result = {
        "metric": "conformer_rnnt_decode_utt_per_sec_per_chip",
        "value": round(utt_per_sec_per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(inv_rtf, 1),
        "baseline_citation": ("vs_baseline is inverse RTF (10 s "
                              "utterances); the reference has no RNN-T "
                              "decode figure"),
        "batch_per_chip": batch_per_chip,
        "beam_width": beam,
        "lm_fusion": fusion,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
