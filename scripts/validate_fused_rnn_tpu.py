#!/usr/bin/env python
"""On-hardware numerical validation of the fused Pallas RNN scans
(interpret-mode equivalence is covered by tests/test_{lstm,gru}_pallas
.py; this checks the Mosaic-lowered kernels at recipe-like shapes):
runs the LSTM and GRU modules with and without the fused path on the
same params/inputs and reports max |diff| of outputs and of input/
param grads.

Usage: python scripts/validate_fused_rnn_tpu.py [B T D H]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402


def check(name, mod_cls, B, T, D, H, dtype):
    from openseq2seq_tpu.parts.rnns.rnn import fused_rnn_config
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D), dtype)
    lengths = np.full((B,), T)
    lengths[1:] = rng.randint(T // 2, T, size=B - 1)
    lengths = jnp.asarray(lengths, jnp.int32)
    mod = mod_cls(hidden_size=H, dtype=dtype)
    params = mod.init(jax.random.PRNGKey(0), x, lengths)

    def fwd(p, x_):
        return mod.apply(p, x_, lengths)[0]

    def loss(p, x_):
        return jnp.sum(fwd(p, x_).astype(jnp.float32) ** 2)

    o1 = jax.jit(fwd)(params, x).astype(jnp.float32)
    g1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    with fused_rnn_config(True):
        o2 = jax.jit(fwd)(params, x).astype(jnp.float32)
        g2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    od = float(jnp.max(jnp.abs(o1 - o2)))
    osc = float(jnp.max(jnp.abs(o1))) + 1e-12
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                  b.astype(jnp.float32))))
        s = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-12
        worst = max(worst, d / s)
    ok = od / osc < 2e-2 and worst < 5e-2
    print("{}: out max|diff| {:.3e} (scale {:.3e}) grad worst-rel "
          "{:.3e} -> {}".format(name, od, osc, worst,
                                "OK" if ok else "MISMATCH"),
          flush=True)
    return ok


def main():
    from openseq2seq_tpu.parts.rnns.rnn import GRU, LSTM
    args = [int(a) for a in sys.argv[1:]]
    B, T, D, H = (args + [32, 96, 320, 1024][len(args):])[:4]
    ok = True
    ok &= check("lstm_bf16", LSTM, B, T, D, H, jnp.bfloat16)
    ok &= check("gru_bf16", GRU, B, T, D, H, jnp.bfloat16)
    ok &= check("lstm_f32", LSTM, B, T, D, H, jnp.float32)
    print("VALIDATE_FUSED_RNN_TPU", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
