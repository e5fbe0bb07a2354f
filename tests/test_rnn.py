import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openseq2seq_tpu.parts.rnns.rnn import BiRNN, GRU, LSTM


def _run(module, x, lengths):
    vars_ = module.init(jax.random.PRNGKey(0), x, lengths)
    return module.apply(vars_, x, lengths), vars_


def test_lstm_shapes_and_masking():
    B, T, D, H = 2, 6, 4, 8
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([6, 3])
    (out, (h, c)), _ = _run(LSTM(H), x, lengths)
    assert out.shape == (B, T, H)
    # outputs past length are zeroed
    assert np.allclose(np.asarray(out)[1, 3:], 0.0)
    assert not np.allclose(np.asarray(out)[1, :3], 0.0)


def test_lstm_carry_freezes_at_length():
    """Final state of a shorter sequence == state at its last valid step
    (padding must not advance the carry)."""
    B, T, D, H = 1, 5, 3, 4
    rng = np.random.RandomState(1)
    full = rng.randn(B, T, D).astype(np.float32)
    lstm = LSTM(H)
    vars_ = lstm.init(jax.random.PRNGKey(0), jnp.asarray(full),
                      jnp.asarray([T]))
    # run padded (len 3 of 5) vs exact (len 3 of 3)
    out_pad, (h_pad, c_pad) = lstm.apply(vars_, jnp.asarray(full),
                                         jnp.asarray([3]))
    out_exact, (h_ex, c_ex) = lstm.apply(vars_, jnp.asarray(full[:, :3]),
                                         jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h_ex),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_pad)[:, :3],
                               np.asarray(out_exact), rtol=1e-5)


def test_backward_lstm_ignores_padding():
    """reverse=True on a padded sequence must equal running the exact
    sequence reversed (leading padding leaves the carry at init)."""
    B, T, D, H = 1, 5, 3, 4
    rng = np.random.RandomState(2)
    full = rng.randn(B, T, D).astype(np.float32)
    lstm = LSTM(H, reverse=True)
    vars_ = lstm.init(jax.random.PRNGKey(0), jnp.asarray(full),
                      jnp.asarray([T]))
    out_pad, _ = lstm.apply(vars_, jnp.asarray(full), jnp.asarray([3]))
    out_exact, _ = lstm.apply(vars_, jnp.asarray(full[:, :3]),
                              jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(out_pad)[:, :3],
                               np.asarray(out_exact), rtol=1e-5, atol=1e-6)


def test_gru_shapes():
    B, T, D, H = 2, 4, 3, 5
    x = jnp.asarray(np.random.RandomState(3).randn(B, T, D), jnp.float32)
    (out, h), _ = _run(GRU(H), x, jnp.asarray([4, 2]))
    assert out.shape == (B, T, H)
    assert h.shape == (B, H)


def test_birnn_concat():
    B, T, D, H = 2, 4, 3, 5
    x = jnp.asarray(np.random.RandomState(4).randn(B, T, D), jnp.float32)
    out, _ = _run(BiRNN(H, cell_type="lstm"), x, jnp.asarray([4, 4]))
    assert out.shape == (B, T, 2 * H)


def test_ds2_encoder_forward(toy_speech_data):
    """DS2 conv+BiLSTM end-to-end single train step on toy data."""
    import jax
    from openseq2seq_tpu.encoders import DeepSpeech2Encoder
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils.test_speech_configs import w2l_test_config
    base_params, _ = w2l_test_config(toy_speech_data["csv"],
                                     toy_speech_data["vocab"], num_epochs=1)
    base_params["encoder"] = DeepSpeech2Encoder
    base_params["encoder_params"] = {
        "conv_layers": [
            {"kernel_size": [11, 41], "stride": [2, 2],
             "num_channels": 8, "padding": "SAME"},
            {"kernel_size": [11, 21], "stride": [1, 2],
             "num_channels": 16, "padding": "SAME"},
        ],
        "num_rnn_layers": 1,
        "rnn_cell_dim": 32,
        "rnn_type": "cudnn_lstm",
        "use_cudnn_rnn": True,
        "rnn_unidirectional": False,
        "row_conv": True,
        "row_conv_width": 4,
        "n_hidden": 64,
        "dropout_keep_prob": 0.9,
        "activation_fn": jax.nn.relu,
    }
    model = Speech2Text(params=base_params, mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_glstm_groups():
    from openseq2seq_tpu.parts.rnns.rnn import GLSTM
    B, T, D, H, G = 2, 5, 8, 8, 4
    x = jnp.asarray(np.random.RandomState(5).randn(B, T, D), jnp.float32)
    mod = GLSTM(H, num_groups=G)
    vars_ = mod.init(jax.random.PRNGKey(0), x, jnp.asarray([5, 5]))
    out, states = mod.apply(vars_, x, jnp.asarray([5, 5]))
    assert out.shape == (B, T, H)
    assert len(states) == G
    # ~1/G the recurrent params of a full LSTM
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(vars_))
    full = LSTM(H)
    fv = full.init(jax.random.PRNGKey(0), x, jnp.asarray([5, 5]))
    n_full = sum(np.prod(p.shape) for p in
                 jax.tree_util.tree_leaves(fv))
    assert n_params < n_full
