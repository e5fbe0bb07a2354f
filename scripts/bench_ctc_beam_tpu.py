#!/usr/bin/env python
"""Benchmark: fully on-device CTC prefix beam search throughput.

Decode-only op bench on ASR-shaped inputs: B utterances of ~10 s
(T=500 output frames at Jasper's 2x time reduction, V=29 char classes),
beam K, optional dense n-gram shallow fusion. The host-side C++
decoder (`native/ctc_decoder/`) is the reference-parity path; this op
removes the device->host logits round trip entirely, so the comparable
figure is utt/s through `ops/ctc_beam.py`'s threaded native decoder on
this host (printed alongside when BENCH_HOST=1).

Prints ONE JSON line. vs_baseline reports inverse RTF (utt/s x 10 s),
the serving-relevant ratio, like bench_transducer_decode.py.

Usage: [BENCH_BS=64] [BENCH_BEAM=16] [BENCH_FUSION=0] [BENCH_HOST=0]
       python scripts/bench_ctc_beam_tpu.py
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
    import jax.numpy as jnp
    from openseq2seq_tpu.ops.ctc_beam_tpu import (FusionLM,
                                                  ctc_beam_search_tpu)

    B = int(os.environ.get("BENCH_BS", "64"))
    K = int(os.environ.get("BENCH_BEAM", "16"))
    T, V = 500, 29
    U = 200                      # transcript-length cap (~chars in 10 s)
    use_fusion = os.environ.get("BENCH_FUSION", "0") == "1"

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)

    fusion = None
    if use_fusion:
        import tempfile
        from openseq2seq_tpu.ops.ngram_fusion import (build_label_lm,
                                                      dense_label_lm)
        labels = tuple("abcdefghijklmnopqrstuvwxyz'_ "[:V - 1])
        texts = ["the quick brown fox jumps over the lazy dog"] * 8
        with tempfile.TemporaryDirectory() as d:
            arpa = build_label_lm(texts, os.path.join(d, "c.arpa"),
                                  order=3)
            table, C, m, init_ctx = dense_label_lm(arpa, labels,
                                                   order=3)
        fusion = FusionLM(jnp.asarray(table), C, m, init_ctx, 0.5, 0.1)

    fn = jax.jit(lambda lg, ln: ctc_beam_search_tpu(
        lg, ln, beam_width=K, max_label_len=U, fusion=fusion))
    ids, lens, scores = fn(logits, lengths)
    # host transfer, not block_until_ready — the remote-relay backend
    # can report ready before remote execution completes
    jax.device_get(scores)

    n_iter = 10
    t0 = time.time()
    for _ in range(n_iter):
        ids, lens, scores = fn(logits, lengths)
    jax.device_get(scores)
    wall = time.time() - t0
    utt_per_sec = n_iter * B / wall

    result = {
        "metric": "ctc_beam%d_tpu_decode_utt_per_sec_per_chip" % K,
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec * UTT_SECONDS, 1),
        "baseline_citation": ("inverse RTF (x real time at 10 s/utt); "
                              "host C++ path is the reference-parity "
                              "comparator (BENCH_HOST=1)"),
        "batch": B, "beam": K, "fusion": use_fusion,
    }
    if os.environ.get("BENCH_HOST", "0") == "1":
        from openseq2seq_tpu.ops.ctc_beam import \
            ctc_beam_search_decoder_batch
        alphabet = list("abcdefghijklmnopqrstuvwxyz'_ "[:V - 1])
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        t0 = time.time()
        ctc_beam_search_decoder_batch(
            [probs[b] for b in range(B)], [T] * B, alphabet,
            beam_size=K)
        host_wall = time.time() - t0
        result["host_cpp_utt_per_sec"] = round(B / host_wall, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
