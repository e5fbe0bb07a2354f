#!/usr/bin/env python
"""Localize Conformer-M step time (bench_conformer.py shapes: bs128,
T=250 after 4x subsampling, D=256, bf16, u8 masks, rbg keys).

Times fwd+bwd of isolated pieces — whole ConformerBlock, the rel-pos
self-attention, one macaron FFN, and the conv module on both compute
paths (XLA vs fused Pallas) — with the `probe_nmt_breakdown.py`
chained-scan method so per-call relay dispatch latency cancels.

Context: full step is ~211 ms at bs128 (profile_conformer.py), 16
blocks -> ~11 ms/block available; this says where inside the block it
goes and whether the fused conv kernel wins in isolation.

Usage: [BENCH_BS=128] [BENCH_T=250] python scripts/probe_conformer_breakdown.py
(T is configurable for long-sequence crossover probes)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N = 20
K = 3


def timeit_chained(grad_fn, variables, x):
    def body(v, x, carry):
        g = grad_fn(v, x * (1.0 + carry * 1e-30).astype(x.dtype))
        leaf = jax.tree.leaves(g)[0]
        return jnp.sum(leaf.astype(jnp.float32)) * 1e-9

    @jax.jit
    def run(v, x):
        c, _ = jax.lax.scan(lambda c, _: (body(v, x, c), None),
                            jnp.float32(0.0), None, length=N)
        return c

    float(jax.device_get(run(variables, x)))
    t0 = time.perf_counter()
    for _ in range(K):
        r = run(variables, x)
    float(jax.device_get(r))
    return (time.perf_counter() - t0) / (N * K) * 1e3


def main():
    from openseq2seq_tpu.encoders.conformer_encoder import (
        ConformerBlock, RelPosSelfAttention, _ConvModule, _FFN)
    from openseq2seq_tpu.parts.dropout import set_dropout_bits

    set_dropout_bits(8)
    B = int(os.environ.get("BENCH_BS", "128"))
    T = int(os.environ.get("BENCH_T", "250"))
    D, H, KS = 256, 4, 31
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D) * 0.1, dt)
    lengths = jnp.asarray([T] * B, jnp.int32)
    pad_mask = jnp.ones((B, T), bool)
    key = jax.random.key(0, impl="rbg")
    dkey = jax.random.key(1, impl="rbg")

    results = {}

    def probe(name, mod, *args, needs_rngs=True):
        try:
            variables = mod.init(
                {"params": jax.random.PRNGKey(0), "dropout": dkey},
                x, *args, True)

            def loss(v, x):
                kw = {"rngs": {"dropout": dkey}} if needs_rngs else {}
                out = mod.apply(v, x, *args, True, **kw)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            grad_fn = jax.grad(loss, argnums=(0,))
            ms = timeit_chained(lambda v, x: grad_fn(v, x)[0],
                                variables, x)
        except Exception as e:   # record and keep probing other pieces
            print(f"  {name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return
        results[name] = round(ms, 3)
        print(f"  {name:28s} {ms:8.3f} ms fwd+bwd", flush=True)

    probe("conformer_block",
          ConformerBlock(num_heads=H, conv_kernel_size=KS,
                         ffn_expansion=4, dropout=0.1,
                         attention_dropout=0.1, conv_norm="layer_norm",
                         dtype=dt),
          lengths, pad_mask)
    probe("rel_pos_attention",
          RelPosSelfAttention(num_heads=H, dropout=0.1, dtype=dt),
          pad_mask)
    probe("rel_pos_attention_flash",
          RelPosSelfAttention(num_heads=H, dropout=0.1, dtype=dt,
                              use_flash=True),
          pad_mask)
    probe("macaron_ffn_x1",
          _FFN(expansion=4, dropout=0.1, dtype=dt))
    probe("conv_module_xla",
          _ConvModule(kernel_size=KS, dropout=0.1, norm="layer_norm",
                      dtype=dt, fused=False),
          lengths)
    probe("conv_module_fused",
          _ConvModule(kernel_size=KS, dropout=0.1, norm="layer_norm",
                      dtype=dt, fused=True),
          lengths)

    print(json.dumps({
        "metric": "conformer_m_block_breakdown_ms_fwd_bwd",
        "batch": B, "T": T, "D": D, "pieces_ms": results,
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
