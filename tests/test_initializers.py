"""Config-driven weight initializers (`parts/initializers.py`) — the
reference threads TF initializers through configs (Jasper:
xavier_initializer(uniform=False), `jasper10x5_LibriSpeech_nvgrad_masks
.py:151-154`) with encoder/decoder falling back to the model-level one
(`encoders/encoder.py:68-69`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.parts.initializers import resolve_initializer


def test_named_initializers_match_jax():
    key = jax.random.PRNGKey(0)
    shape = (64, 128)
    for name, want in [
            ("xavier_normal", jax.nn.initializers.glorot_normal()),
            ("xavier_uniform", jax.nn.initializers.glorot_uniform()),
            ("he_normal", jax.nn.initializers.he_normal()),
            ("lecun_uniform", jax.nn.initializers.lecun_uniform())]:
        got = resolve_initializer(name)(key, shape, jnp.float32)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(want(key, shape,
                                                      jnp.float32)))


def test_tf_style_uniform_flag():
    key = jax.random.PRNGKey(1)
    shape = (32, 32)
    normal = resolve_initializer("xavier", {"uniform": False})
    uniform = resolve_initializer("xavier", {"uniform": True})
    ref_n = jax.nn.initializers.glorot_normal()(key, shape, jnp.float32)
    ref_u = jax.nn.initializers.glorot_uniform()(key, shape, jnp.float32)
    np.testing.assert_array_equal(np.asarray(normal(key, shape,
                                                    jnp.float32)),
                                  np.asarray(ref_n))
    np.testing.assert_array_equal(np.asarray(uniform(key, shape,
                                                     jnp.float32)),
                                  np.asarray(ref_u))
    # TF's xavier_initializer defaults to uniform=True; bare "xavier"
    # here defaults to normal (the Jasper encoder's choice) — both
    # spellings exist so configs state intent explicitly either way.


def test_none_and_callable_passthrough():
    assert resolve_initializer(None) is None
    built = jax.nn.initializers.orthogonal()
    assert resolve_initializer(built) is built
    factory = jax.nn.initializers.glorot_normal
    got = resolve_initializer(factory)
    key = jax.random.PRNGKey(2)
    np.testing.assert_array_equal(
        np.asarray(got(key, (8, 8), jnp.float32)),
        np.asarray(factory()(key, (8, 8), jnp.float32)))
    with pytest.raises(ValueError):
        resolve_initializer("not_an_init")


def test_tdnn_consumes_initializer(toy_speech_data):
    """The flagship recipe's xavier init must actually change the conv
    kernels' draw vs the flax default, and the model-level initializer
    must flow into components that set none."""
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        w2l_test_config)

    def build(**extra):
        params, _ = w2l_test_config(toy_speech_data["csv"],
                                    toy_speech_data["vocab"])
        params.update(extra)
        m = Speech2Text(params=params, mode="train")
        from openseq2seq_tpu.training import trainer
        state = trainer.restore_state(m)
        return jax.tree_util.tree_leaves(state.params)

    default = build()
    xavier = build(initializer="xavier_normal")
    # same structure, different draws on at least the conv kernels
    assert len(default) == len(xavier)
    diffs = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(default, xavier)]
    assert any(diffs)
