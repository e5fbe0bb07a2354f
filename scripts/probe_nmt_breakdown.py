#!/usr/bin/env python
"""Localize transformer-big NMT step time (bench_nmt.py shapes).

Times fwd+bwd of isolated pieces — encoder, decoder+logits,
logits+smoothing-CE — each as its own small jit program (remote-TPU
compile is per-program, so the piece list stays short).

Usage:  python scripts/probe_nmt_breakdown.py [bs]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from openseq2seq_tpu.decoders.transformer_decoder import \
        TransformerDecoderModule
    from openseq2seq_tpu.encoders.transformer_encoder import \
        TransformerEncoderModule
    from openseq2seq_tpu.parts.transformer.common import project_logits

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T, D, V = 64, 1024, 32768
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    enc = TransformerEncoderModule(
        encoder_layers=6, hidden_size=D, num_heads=16,
        attention_dropout=0.1, filter_size=4 * D, relu_dropout=0.3,
        layer_postprocess_dropout=0.3, src_vocab_size=V,
        pad_embeddings_2_eight=True, dtype_=jnp.bfloat16)
    src = jnp.asarray(rng.randint(3, V, (bs, T)))
    src_len = jnp.full((bs,), T)
    ev = enc.init({"params": key, "dropout": key},
                  {"source_tensors": [src, src_len]}, train=True)

    def enc_loss(v, src, src_len):
        out = enc.apply(v, {"source_tensors": [src, src_len]},
                        train=True, rngs={"dropout": key})
        return jnp.sum(out["outputs"].astype(jnp.float32) ** 2) * 1e-9

    enc_g = jax.jit(jax.grad(enc_loss))
    t_enc = timeit(enc_g, ev, src, src_len)
    print(f"bs={bs} encoder fwd+bwd: {t_enc:8.2f} ms", flush=True)

    dec = TransformerDecoderModule(
        num_hidden_layers=6, hidden_size=D, num_heads=16,
        attention_dropout=0.1, filter_size=4 * D, relu_dropout=0.3,
        layer_postprocess_dropout=0.3, tgt_vocab_size=V,
        beam_size=4, alpha=0.6, extra_decode_length=50,
        eos_id=1, go_symbol=2, dtype_=jnp.bfloat16, mode="train")
    tgt = jnp.asarray(rng.randint(3, V, (bs, T)))
    table = jnp.asarray(rng.randn(V, D) * 0.03, jnp.float32)
    memory = jnp.asarray(rng.randn(bs, T, D), jnp.bfloat16)

    def dec_input(table, memory):
        return {"target_tensors": [tgt, src_len],
                "encoder_output": {
                    "outputs": memory,
                    "embedding_table": table,
                    "attention_bias": jnp.zeros((bs, 1, 1, T)),
                    "src_length": src_len}}

    dv = dec.init({"params": key, "dropout": key},
                  dec_input(table, memory), train=True)

    def dec_loss(v, table, tgt, memory):
        out = dec.apply(v, dec_input(table, memory),
                        train=True, rngs={"dropout": key})
        return jnp.sum(out["logits"]) * 1e-9

    dec_g = jax.jit(jax.grad(dec_loss, argnums=(0, 1)))
    t_dec = timeit(dec_g, dv, table, tgt, memory)
    print(f"bs={bs} decoder fwd+bwd (incl logits): {t_dec:8.2f} ms",
          flush=True)

    # label-smoothing CE on top of a given hidden stream
    h = jnp.asarray(rng.randn(bs, T, D), jnp.bfloat16)

    def proj_ce(table, h, tgt):
        logits = project_logits(table, h, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        smooth = 0.9 * jnp.take_along_axis(
            logp, tgt[..., None], axis=-1)[..., 0] + \
            0.1 / V * jnp.sum(logp, -1)
        return -jnp.mean(smooth) * 1e-3

    ce_g = jax.jit(jax.grad(proj_ce, argnums=(0, 1)))
    t_ce = timeit(ce_g, table, h, tgt)
    print(f"bs={bs} logits+smoothing-CE fwd+bwd: {t_ce:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
