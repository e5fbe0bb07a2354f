"""Fused Pallas LSTM scan (`ops/lstm_pallas.py`) vs the `lax.scan`
reference in `parts/rnns/rnn.LSTM`: forward and gradient equivalence
in interpreter mode, length masking, initial-state handling."""
import numpy as np

import jax
import jax.numpy as jnp

from openseq2seq_tpu.ops import lstm_pallas as lp


def _scan_reference(x_proj, wh, h0, c0, lengths, forget_bias=1.0):
    """The exact step math of parts/rnns/rnn.LSTM's scan."""
    B, T, H4 = x_proj.shape
    H = H4 // 4
    mask = (jnp.arange(T)[None, :] <
            lengths[:, None]).astype(jnp.float32)

    def step(carry, inp):
        h, c = carry
        xp, m = inp
        gates = xp + h @ wh.astype(h.dtype)
        i, f, g, o = jnp.split(gates.astype(jnp.float32), 4, axis=-1)
        c_new = (jax.nn.sigmoid(f + forget_bias) * c +
                 jax.nn.sigmoid(i) * jnp.tanh(g))
        h_new = (jax.nn.sigmoid(o) * jnp.tanh(c_new)).astype(h.dtype)
        m = m[:, None]
        h = h_new * m.astype(h.dtype) + h * (1 - m).astype(h.dtype)
        c = c_new * m + c * (1 - m)
        return (h, c), h

    xs = (jnp.moveaxis(x_proj, 1, 0), jnp.moveaxis(mask, 1, 0))
    (h_l, c_l), ys = jax.lax.scan(step, (h0, c0), xs)
    return jnp.moveaxis(ys, 0, 1), (h_l, c_l)


def _mk(B=8, T=12, H=128, seed=0):
    rng = np.random.RandomState(seed)
    x_proj = jnp.asarray(rng.randn(B, T, 4 * H) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.randn(H, 4 * H) * 0.05, jnp.float32)
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    lengths = jnp.asarray([T, T - 5] + [T] * (B - 2), jnp.int32)[:B]
    return x_proj, wh, h0, c0, lengths


def test_forward_matches_scan():
    x_proj, wh, h0, c0, lengths = _mk()
    want_ys, (want_h, want_c) = _scan_reference(x_proj, wh, h0, c0,
                                                lengths)
    got_ys, (got_h, got_c) = lp.lstm_scan(x_proj, wh, h0, c0, lengths,
                                          1.0, True)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)


def test_forward_nonzero_initial_state():
    x_proj, wh, _, _, lengths = _mk(seed=3)
    rng = np.random.RandomState(9)
    h0 = jnp.asarray(rng.randn(8, 128) * 0.2, jnp.float32)
    c0 = jnp.asarray(rng.randn(8, 128) * 0.2, jnp.float32)
    want_ys, _ = _scan_reference(x_proj, wh, h0, c0, lengths)
    got_ys, _ = lp.lstm_scan(x_proj, wh, h0, c0, lengths, 1.0, True)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    x_proj, wh, h0, c0, lengths = _mk(B=8, T=9, H=128, seed=1)

    def loss_fused(xp, w):
        ys, (h_l, c_l) = lp.lstm_scan(xp, w, h0, c0, lengths, 1.0,
                                      True)
        return (jnp.sum(jnp.sin(ys)) + jnp.sum(h_l * h_l) +
                jnp.sum(c_l))

    def loss_ref(xp, w):
        ys, (h_l, c_l) = _scan_reference(xp, w, h0, c0, lengths)
        return (jnp.sum(jnp.sin(ys)) + jnp.sum(h_l * h_l) +
                jnp.sum(c_l))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x_proj, wh)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x_proj, wh)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=2e-4, atol=2e-4, err_msg="dx_proj")
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=2e-4, atol=2e-4, err_msg="dwh")


def test_masked_tail_rows_grad_zero():
    x_proj, wh, h0, c0, _ = _mk(B=8, T=10, H=128, seed=2)
    lengths = jnp.asarray([10, 4] + [10] * 6, jnp.int32)

    def loss(xp):
        ys, _ = lp.lstm_scan(xp, wh, h0, c0, lengths, 1.0, True)
        return jnp.sum(ys ** 2)

    dx = jax.grad(loss)(x_proj)
    # row 1's steps beyond its length must receive zero gradient
    assert float(jnp.abs(dx[1, 4:]).max()) == 0.0
    assert float(jnp.abs(dx[1, :4]).max()) > 0.0


def test_supported_gate():
    assert lp.supported(224, 96, 1024, interpret=True)
    assert not lp.supported(224, 96, 100, interpret=True)  # H%128


def test_lstm_module_fused_path_matches():
    """parts/rnns/rnn.LSTM routed through the fused kernel (config
    context + FORCE_INTERPRET) must match the scan path exactly,
    including gradients through a small training-style loss."""
    from openseq2seq_tpu.parts.rnns.rnn import LSTM, fused_rnn_config
    from openseq2seq_tpu.ops import lstm_pallas as lp_mod

    rng = np.random.RandomState(5)
    B, T, D, H = 8, 10, 64, 128
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, 6] + [T] * (B - 2), jnp.int32)
    mod = LSTM(hidden_size=H)
    params = mod.init(jax.random.PRNGKey(0), x, lengths)

    def loss(p, x_):
        ys, (h_l, c_l) = mod.apply(p, x_, lengths)
        return jnp.sum(ys ** 2) + jnp.sum(h_l) + jnp.sum(c_l)

    want = mod.apply(params, x, lengths)
    gw = jax.grad(loss)(params, x)
    old = lp_mod.FORCE_INTERPRET
    lp_mod.FORCE_INTERPRET = True
    try:
        with fused_rnn_config(True):
            got = mod.apply(params, x, lengths)
            gf = jax.grad(loss)(params, x)
    finally:
        lp_mod.FORCE_INTERPRET = old
    np.testing.assert_allclose(np.asarray(got[0]),
                               np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_lstm_module_fused_reverse_matches():
    """Reverse cells run the kernel over flipped inputs with suffix
    masking — outputs and final states must match the scan path."""
    from openseq2seq_tpu.parts.rnns.rnn import LSTM, fused_rnn_config
    from openseq2seq_tpu.ops import lstm_pallas as lp_mod

    rng = np.random.RandomState(6)
    B, T, D, H = 8, 11, 32, 128
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, 5, 8] + [T] * (B - 3), jnp.int32)
    mod = LSTM(hidden_size=H, reverse=True)
    params = mod.init(jax.random.PRNGKey(1), x, lengths)
    want_ys, (want_h, want_c) = mod.apply(params, x, lengths)
    old = lp_mod.FORCE_INTERPRET
    lp_mod.FORCE_INTERPRET = True
    try:
        with fused_rnn_config(True):
            got_ys, (got_h, got_c) = mod.apply(params, x, lengths)
    finally:
        lp_mod.FORCE_INTERPRET = old
    np.testing.assert_allclose(np.asarray(got_ys),
                               np.asarray(want_ys),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)


def test_bf16_compute_path_close():
    """The LM runs the kernel under dtype='mixed' (bf16 x_proj/h);
    fused vs scan must stay within bf16 tolerance, fwd and grads."""
    from openseq2seq_tpu.parts.rnns.rnn import LSTM, fused_rnn_config
    from openseq2seq_tpu.ops import lstm_pallas as lp_mod

    rng = np.random.RandomState(8)
    B, T, D, H = 8, 12, 64, 128
    x = jnp.asarray(rng.randn(B, T, D), jnp.bfloat16)
    lengths = jnp.asarray([T, 7] + [T] * (B - 2), jnp.int32)
    mod = LSTM(hidden_size=H, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x, lengths)

    def loss(p, x_):
        ys, _ = mod.apply(p, x_, lengths)
        return jnp.sum(ys.astype(jnp.float32) ** 2)

    want = mod.apply(params, x, lengths)[0].astype(jnp.float32)
    gw = jax.grad(loss)(params, x)
    old = lp_mod.FORCE_INTERPRET
    lp_mod.FORCE_INTERPRET = True
    try:
        with fused_rnn_config(True):
            got = mod.apply(params, x, lengths)[0].astype(jnp.float32)
            gf = jax.grad(loss)(params, x)
    finally:
        lp_mod.FORCE_INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gw)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32),
            np.asarray(b, dtype=np.float32), rtol=0.1, atol=0.5)
