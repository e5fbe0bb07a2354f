"""Fused Pallas GRU scan (`ops/gru_pallas.py`) vs the `lax.scan` path
in `parts/rnns/rnn.GRU`: forward/gradient equivalence in interpreter
mode, forward and reverse cells, length masking."""
import numpy as np

import jax
import jax.numpy as jnp

from openseq2seq_tpu.ops import gru_pallas as gp
from openseq2seq_tpu.parts.rnns.rnn import GRU, fused_rnn_config


def _mk(B=8, T=11, D=48, H=128, seed=0, reverse=False):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, T - 4, 6] + [T] * (B - 3), jnp.int32)
    mod = GRU(hidden_size=H, reverse=reverse)
    params = mod.init(jax.random.PRNGKey(seed), x, lengths)
    return x, lengths, mod, params


def _fused(fn):
    old = gp.FORCE_INTERPRET
    gp.FORCE_INTERPRET = True
    try:
        with fused_rnn_config(True):
            return fn()
    finally:
        gp.FORCE_INTERPRET = old


def test_forward_matches_scan():
    x, lengths, mod, params = _mk()
    want_ys, want_h = mod.apply(params, x, lengths)
    got_ys, got_h = _fused(lambda: mod.apply(params, x, lengths))
    np.testing.assert_allclose(np.asarray(got_ys),
                               np.asarray(want_ys),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)


def test_reverse_matches_scan():
    x, lengths, mod, params = _mk(seed=2, reverse=True)
    want_ys, want_h = mod.apply(params, x, lengths)
    got_ys, got_h = _fused(lambda: mod.apply(params, x, lengths))
    np.testing.assert_allclose(np.asarray(got_ys),
                               np.asarray(want_ys),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    x, lengths, mod, params = _mk(seed=1)

    def loss(p, x_):
        ys, h_l = mod.apply(p, x_, lengths)
        return jnp.sum(jnp.sin(ys)) + jnp.sum(h_l * h_l)

    gw = jax.grad(loss, argnums=(0, 1))(params, x)
    gf = _fused(lambda: jax.grad(loss, argnums=(0, 1))(params, x))
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_masked_tail_grad_zero():
    x, lengths, mod, params = _mk(seed=3)
    lengths = jnp.asarray([11, 4] + [11] * 6, jnp.int32)

    def loss(x_):
        ys, _ = mod.apply(params, x_, lengths)
        return jnp.sum(ys ** 2)

    dx = _fused(lambda: jax.grad(loss)(x))
    assert float(jnp.abs(dx[1, 4:]).max()) == 0.0
    assert float(jnp.abs(dx[1, :4]).max()) > 0.0
