#!/usr/bin/env python
"""Localize the LSTM-LM step time (bench_lm.py shapes: bs224, bptt 96,
268k vocab, 320-emb, 3x1024 scan-LSTM, 8192-candidate sampled softmax;
measured MFU 0.147 — PARITY "low-MFU tails").

Times fwd+bwd of isolated pieces with the chained-scan harness
(per-call dispatch over the remote relay would otherwise dominate):

  * embedding_gather      — (B,T) int32 -> (B,T,E) rows of the 268k
                            table, plus the scatter-add backward;
  * lstm_stack            — the 3x1024 scan over bptt steps (input
                            projections already hoisted out of the
                            scan, parts/rnns/rnn.py:47);
  * lstm_cell_matmul_only — ONE (B,1024)x(1024,4096) matmul chained
                            bptt*3 times: the pure sequential-matmul
                            floor of the scan (gap to lstm_stack =
                            gate elementwise + scan overhead);
  * sampled_softmax       — the candidate-sampling CE over
                            [true | 8192 sampled] logits.

Usage: [BENCH_BS=224] [BENCH_BPTT=96] python scripts/probe_lm_breakdown.py
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

N = 10
K = 3


def timeit_chained(grad_fn, variables, x):
    def body(v, x_, carry):
        xp = jax.tree.map(
            lambda a: (a * (1.0 + carry * 1e-30).astype(a.dtype)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            x_)
        g = grad_fn(v, xp)
        leaf = jax.tree.leaves(g)[0]
        return jnp.sum(leaf.astype(jnp.float32)) * 1e-9

    @jax.jit
    def run(v, x_):
        c, _ = jax.lax.scan(lambda c, _: (body(v, x_, c), None),
                            jnp.float32(0.0), None, length=N)
        return c

    float(jax.device_get(run(variables, x)))
    t0 = time.perf_counter()
    for _ in range(K):
        r = run(variables, x)
    float(jax.device_get(r))
    return (time.perf_counter() - t0) / (N * K) * 1e3


def main():
    from openseq2seq_tpu.parts.rnns.rnn import LSTM

    B = int(os.environ.get("BENCH_BS", "224"))
    T = int(os.environ.get("BENCH_BPTT", "96"))
    V = int(os.environ.get("BENCH_VOCAB", "267744"))
    E, H, S = 320, 1024, 8192
    rng = np.random.RandomState(0)
    results = {}

    def probe(name, make):
        try:
            grad_fn, variables, x = make()
            ms = timeit_chained(grad_fn, variables, x)
            results[name] = round(ms, 3)
            print("  {:26s} {:8.3f} ms fwd+bwd".format(name, ms),
                  flush=True)
        except Exception as e:   # record, keep probing
            print("  {:26s} FAILED: {}".format(name, e), flush=True)

    # -- embedding gather ------------------------------------------------
    def mk_gather():
        table = jnp.asarray(rng.randn(V, E) * 0.1, jnp.float32)
        ids = jnp.asarray(rng.randint(0, V, (B, T)), jnp.int32)

        def loss(v, ids_):
            rows = jnp.take(v, ids_, axis=0).astype(jnp.bfloat16)
            return jnp.sum(rows.astype(jnp.float32) ** 2)

        return jax.grad(loss), table, ids

    probe("embedding_gather", mk_gather)

    # -- lstm stack ------------------------------------------------------
    def mk_stack():
        x = jnp.asarray(rng.randn(B, T, E), jnp.bfloat16)
        lengths = jnp.full((B,), T, jnp.int32)
        mods = [LSTM(hidden_size=H, dtype=jnp.bfloat16)
                for _ in range(3)]

        def fwd(vs, x_):
            h = x_
            for m, v in zip(mods, vs):
                h, _ = m.apply(v, h, lengths)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        variables = []
        h = x
        for m in mods:
            v = m.init(jax.random.PRNGKey(0), h, lengths)
            h = m.apply(v, h, lengths)[0]
            variables.append(v)
        return jax.grad(fwd, argnums=0), variables, x

    probe("lstm_stack", mk_stack)

    # -- pure sequential matmul floor -----------------------------------
    def mk_floor():
        w = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)
        h0 = jnp.asarray(rng.randn(B, H), jnp.bfloat16)

        def loss(v, h):
            def stepf(c, _):
                g = c @ v
                return jnp.tanh(g[:, :H]), None
            c, _ = jax.lax.scan(stepf, h, None, length=T * 3)
            return jnp.sum(c.astype(jnp.float32) ** 2)

        return jax.grad(loss), w, h0

    probe("lstm_cell_matmul_only", mk_floor)

    # -- sampled softmax -------------------------------------------------
    def mk_sampled():
        sm_w = jnp.asarray(rng.randn(V, H) * 0.02, jnp.float32)
        inputs = jnp.asarray(rng.randn(B * T, H), jnp.bfloat16)
        labels = jnp.asarray(rng.randint(0, V, (B * T,)), jnp.int32)
        cand = jnp.asarray(rng.randint(0, V, (S,)), jnp.int32)

        def loss(v, args):
            inp, lab = args
            true_w = jnp.take(v, lab, axis=0).astype(jnp.bfloat16)
            samp_w = jnp.take(v, cand, axis=0).astype(jnp.bfloat16)
            true_logit = jnp.sum(inp * true_w, axis=-1,
                                 keepdims=True).astype(jnp.float32)
            samp_logit = (inp @ samp_w.T).astype(jnp.float32)
            logits = jnp.concatenate([true_logit, samp_logit], axis=1)
            return jnp.mean(
                -jax.nn.log_softmax(logits, axis=-1)[:, 0])

        return jax.grad(loss), sm_w, (inputs, labels)

    probe("sampled_softmax", mk_sampled)

    print(json.dumps({
        "metric": "lstm_lm_breakdown_ms_fwd_bwd",
        "batch": B, "bptt": T, "vocab": V,
        "pieces_ms": results,
    }))


if __name__ == "__main__":
    sys.exit(main())
