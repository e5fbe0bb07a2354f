"""Flash-attention integration: on non-TPU backends the ``use_flash``
flag must fall back to the plain path bit-for-bit; on TPU the kernel
itself is validated by the manual script (see attention.py docstring)
and by the NMT bench numbers."""
import numpy as np

import jax
import jax.numpy as jnp

from openseq2seq_tpu.parts.transformer.attention import (CrossAttention,
                                                         SelfAttention)


def _run(mod, *args, **kw):
    variables = mod.init(jax.random.PRNGKey(0), *args, **kw)
    return variables, mod.apply(variables, *args, **kw)


def test_use_flash_falls_back_identically_off_tpu():
    assert jax.default_backend() != "tpu"   # conftest forces CPU
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    bias = jnp.zeros((2, 1, 1, 16))
    plain = SelfAttention(hidden_size=32, num_heads=4,
                          attention_dropout=0.0)
    flash = SelfAttention(hidden_size=32, num_heads=4,
                          attention_dropout=0.0, use_flash=True)
    v1, (o1, _) = _run(plain, x, bias=bias)
    o2, _ = flash.apply(v1, x, bias=bias)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_cross_attention_flash_flag_off_tpu():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    mem = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    bias = jnp.zeros((2, 1, 1, 16))
    plain = CrossAttention(hidden_size=32, num_heads=4,
                           attention_dropout=0.0)
    flash = CrossAttention(hidden_size=32, num_heads=4,
                           attention_dropout=0.0, use_flash=True)
    v1 = plain.init(jax.random.PRNGKey(0), x, memory=mem, bias=bias)
    o1 = plain.apply(v1, x, memory=mem, bias=bias)
    o2 = flash.apply(v1, x, memory=mem, bias=bias)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
