"""Tests for parts/dropout.py (u8-bits dropout masks)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openseq2seq_tpu.parts.dropout import (Dropout, get_dropout_bits,
                                           set_dropout_bits)


@pytest.fixture(autouse=True)
def _restore_bits():
    yield
    set_dropout_bits(32)


def _apply(layer, x, seed=0):
    return layer.apply({}, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(seed)})


def test_default_matches_flax_exactly():
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 128))
    ours = _apply(Dropout(rate=0.3), x)
    flax = _apply(nn.Dropout(rate=0.3), x)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(flax))


def test_u8_keep_rate_and_mean():
    set_dropout_bits(8)
    assert get_dropout_bits() == 8
    rate = 0.1
    x = jnp.ones((256, 1024))
    y = np.asarray(_apply(Dropout(rate=rate), x))
    kept = (y != 0).mean()
    q = round((1.0 - rate) * 256) / 256
    assert abs(kept - q) < 0.01
    # rescaling by the QUANTIZED keep prob keeps the mean unbiased
    assert abs(y.mean() - 1.0) < 0.01
    # kept elements scaled by exactly 1/q
    np.testing.assert_allclose(y[y != 0], 1.0 / q, rtol=1e-6)


def test_u8_deterministic_and_seed_sensitive():
    set_dropout_bits(8)
    x = jnp.ones((32, 64))
    a = np.asarray(_apply(Dropout(rate=0.4), x, seed=7))
    b = np.asarray(_apply(Dropout(rate=0.4), x, seed=7))
    c = np.asarray(_apply(Dropout(rate=0.4), x, seed=8))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_u8_broadcast_dims():
    set_dropout_bits(8)
    x = jnp.ones((8, 16, 32))
    y = np.asarray(_apply(Dropout(rate=0.5, broadcast_dims=(1,)), x))
    # mask shared along axis 1: each (b, :, f) column all-zero or all-kept
    col_kept = (y != 0).all(axis=1)
    col_dropped = (y == 0).all(axis=1)
    assert np.logical_or(col_kept, col_dropped).all()


def test_deterministic_mode_and_edge_rates():
    set_dropout_bits(8)
    x = jnp.ones((4, 4))
    out = Dropout(rate=0.5).apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = _apply(Dropout(rate=0.0), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = _apply(Dropout(rate=1.0), x)
    np.testing.assert_array_equal(np.asarray(out), np.zeros_like(x))


def test_model_param_wires_global(tmp_path):
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils import toy_speech
    from openseq2seq_tpu.test_utils.test_speech_configs import \
        w2l_test_config

    csv_path, vocab_path = toy_speech.generate(str(tmp_path))
    cfg, _ = w2l_test_config(csv_path, vocab_path, num_epochs=1)
    cfg["dropout_bits"] = 8
    Speech2Text(params=cfg, mode="train")
    assert get_dropout_bits() == 8
    with pytest.raises(ValueError):
        cfg2 = dict(cfg)
        cfg2["dropout_bits"] = 16
        Speech2Text(params=cfg2, mode="train")


def test_dropout_bits_bound_at_trace_time_per_model(tmp_path):
    """Constructing a second model must NOT clobber an earlier model's
    dropout_bits: the setting is (re)bound from the model's own params
    when its step is traced (`models/model.py` loss_fn ->
    `parts/dropout.py:dropout_config`), not only at construction."""
    import jax
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils import toy_speech
    from openseq2seq_tpu.test_utils.test_speech_configs import \
        w2l_test_config

    csv_path, vocab_path = toy_speech.generate(str(tmp_path))
    cfg, _ = w2l_test_config(csv_path, vocab_path, num_epochs=1)
    cfg["dropout_bits"] = 8
    # the toy config disables dropout; give it a real rate so the
    # mask draw appears in the trace
    cfg["encoder_params"]["dropout_keep_prob"] = 0.8
    model_u8 = Speech2Text(params=cfg, mode="train")
    batch = next(iter(model_u8.get_data_layer().iterate_one_epoch()))
    state = model_u8.init_state(batch)

    # a second model with default (32-bit) masks resets the global...
    cfg32 = dict(cfg)
    cfg32.pop("dropout_bits")
    model_32 = Speech2Text(params=cfg32, mode="train")
    assert get_dropout_bits() == 32

    # ...but tracing the first model's step still draws u8 masks
    # (threefry u8 draws appear as ui8 tensors in StableHLO)
    hlo = jax.jit(model_u8.train_step).lower(
        state, batch, jax.random.PRNGKey(0)).as_text()
    assert "ui8" in hlo
    # and the 32-bit model's own trace does NOT
    state32 = model_32.init_state(batch)
    hlo32 = jax.jit(model_32.train_step).lower(
        state32, batch, jax.random.PRNGKey(0)).as_text()
    assert "ui8" not in hlo32
    # and the global is restored afterwards
    assert get_dropout_bits() == 32


def test_dropout_remat_bit_identical_fwd_and_grad():
    """Key-only residual mode regenerates the identical mask in the
    backward pass: outputs AND gradients must match the store-the-mask
    path bit for bit, for both mask widths."""
    import jax
    from openseq2seq_tpu.parts.dropout import set_dropout_remat

    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 16),
                    jnp.float32)
    key = jax.random.key(42)
    mod = Dropout(rate=0.3)
    try:
        for bits in (32, 8):
            set_dropout_bits(bits)
            outs, grads = {}, {}
            for remat in (False, True):
                set_dropout_remat(remat)
                fv = lambda x_: mod.apply(  # noqa: E731
                    {}, x_, deterministic=False, rngs={"dropout": key})
                outs[remat] = jax.jit(fv)(x)
                grads[remat] = jax.jit(
                    jax.grad(lambda x_: fv(x_).sum()))(x)
            np.testing.assert_array_equal(np.asarray(outs[False]),
                                          np.asarray(outs[True]))
            np.testing.assert_array_equal(np.asarray(grads[False]),
                                          np.asarray(grads[True]))
    finally:
        set_dropout_remat(False)


def test_relu_dropout_matches_composite():
    """relu_dropout == Dropout(rate)(relu(x)) bit-for-bit in forward
    (same mask stream) and gradient-equal away from x == 0, for both
    mask widths; its backward carries no mask residual by construction
    (parts/dropout.py block comment)."""
    import jax
    from openseq2seq_tpu.parts.dropout import relu_dropout

    x = jnp.asarray(np.random.RandomState(1).randn(4, 8, 32),
                    jnp.float32)
    key = jax.random.key(7)
    mod = Dropout(rate=0.3)

    def composite(x_):
        import jax.nn
        return mod.apply({}, jax.nn.relu(x_), deterministic=False,
                         rng=key)

    def fused(x_):
        return relu_dropout(key, 0.3, x_)

    try:
        for bits in (32, 8):
            set_dropout_bits(bits)
            np.testing.assert_array_equal(
                np.asarray(jax.jit(composite)(x)),
                np.asarray(jax.jit(fused)(x)))
            g1 = jax.jit(jax.grad(lambda v: composite(v).sum()))(x)
            g2 = jax.jit(jax.grad(lambda v: fused(v).sum()))(x)
            np.testing.assert_array_equal(np.asarray(g1),
                                          np.asarray(g2))
    finally:
        set_dropout_bits(32)


def test_relu_dropout_rate_zero_is_relu():
    import jax
    from openseq2seq_tpu.parts.dropout import relu_dropout
    x = jnp.asarray(np.random.RandomState(2).randn(3, 5), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(relu_dropout(jax.random.key(0), 0.0, x)),
        np.asarray(jax.nn.relu(x)))
