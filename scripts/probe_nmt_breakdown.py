#!/usr/bin/env python
"""Localize transformer-big NMT step time (bench_nmt.py shapes).

Times fwd+bwd of isolated pieces — encoder, decoder+logits,
logits+smoothing-CE. Each piece runs N chained iterations INSIDE one
jit program (a lax.scan whose carry perturbs the next input), so the
measurement is device time — per-call dispatch latency over the
remote-TPU relay would otherwise dominate (~150 ms/call, larger than
the 92 ms full step it tries to decompose).

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

N = 20
K = 3     # back-to-back program launches to amortize dispatch latency


def timeit_chained(grad_fn, variables, x):
    """Scan N grad evaluations with a data dependence between
    iterations; returns ms per iteration of pure device time.
    variables/x are jit ARGUMENTS (not closure constants — closed-over
    arrays would be baked into the program as duplicated-HBM, possibly
    constant-folded XLA constants). The perturbation is cast back to
    x's dtype so bf16 probes stay bf16."""
    def body(v, x, carry):
        g = grad_fn(v, x * (1.0 + carry * 1e-30).astype(
            jax.tree.leaves(x)[0].dtype))
        leaf = jax.tree.leaves(g)[0]
        return jnp.sum(leaf.astype(jnp.float32)) * 1e-9

    @jax.jit
    def run(v, x):
        c, _ = jax.lax.scan(lambda c, _: (body(v, x, c), None),
                            jnp.float32(0.0), None, length=N)
        return c

    float(jax.device_get(run(variables, x)))      # compile + warm
    t0 = time.perf_counter()
    for _ in range(K):
        r = run(variables, x)
    float(jax.device_get(r))
    return (time.perf_counter() - t0) / (N * K) * 1e3


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

    src = jnp.asarray(rng.randint(3, V, (bs, T)))
    tgt = jnp.asarray(rng.randint(3, V, (bs, T)))
    src_len = jnp.full((bs,), T)

    # --- encoder ---
    enc = TransformerEncoderModule(
        encoder_layers=6, hidden_size=D, num_heads=16,
        attention_dropout=0.1, filter_size=4 * D, relu_dropout=0.3,
        layer_postprocess_dropout=0.3, src_vocab_size=V,
        pad_embeddings_2_eight=True, dtype_=jnp.bfloat16)
    ev = enc.init({"params": key, "dropout": key},
                  {"source_tensors": [src, src_len]}, train=True)

    def enc_loss(v, lens_scale):
        out = enc.apply(v, {"source_tensors": [src, src_len]},
                        train=True, rngs={"dropout": key})
        return jnp.sum(out["outputs"].astype(jnp.float32) ** 2) * \
            1e-9 * lens_scale

    t = timeit_chained(jax.grad(enc_loss), ev, jnp.float32(1.0))
    print(f"bs={bs} encoder fwd+bwd: {t:8.2f} ms", flush=True)

    # --- decoder (incl logits projection) ---
    dec = TransformerDecoderModule(
        num_hidden_layers=6, hidden_size=D, num_heads=16,
        attention_dropout=0.1, filter_size=4 * D, relu_dropout=0.3,
        layer_postprocess_dropout=0.3, tgt_vocab_size=V,
        beam_size=4, alpha=0.6, extra_decode_length=50,
        eos_id=1, go_symbol=2, dtype_=jnp.bfloat16, mode="train")
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

    def dec_loss(vt, memory):
        out = dec.apply(vt["module"], dec_input(vt["table"], memory),
                        train=True, rngs={"dropout": key})
        return jnp.sum(out["logits"]) * 1e-9

    t = timeit_chained(jax.grad(dec_loss, argnums=(0, 1)),
                       {"module": dv, "table": table}, memory)
    print(f"bs={bs} decoder fwd+bwd (incl logits): {t:8.2f} ms",
          flush=True)

    # --- logits + label-smoothing CE ---
    h = jnp.asarray(rng.randn(bs, T, D), jnp.bfloat16)

    def proj_ce(tab, h):
        logits = project_logits(tab, h, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        smooth = 0.9 * jnp.take_along_axis(
            logp, tgt[..., None], axis=-1)[..., 0] + \
            0.1 / V * jnp.sum(logp, -1)
        return -jnp.mean(smooth) * 1e-3

    t = timeit_chained(jax.grad(proj_ce, argnums=(0, 1)), table, h)
    print(f"bs={bs} logits+smoothing-CE fwd+bwd: {t:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
