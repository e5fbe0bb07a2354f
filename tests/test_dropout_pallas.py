"""Fused dropout(+residual) Pallas kernels (`ops/dropout_pallas.py`):
mask statistics, exact mean preservation, fwd/bwd mask agreement, and
the PreNormResidual / FeedForwardNetwork integration."""
import numpy as np

import jax
import jax.numpy as jnp

from openseq2seq_tpu.ops import dropout_pallas as dp


def test_statistics_and_rescale():
    key = jax.random.PRNGKey(0)
    y = jnp.ones((64, 128), jnp.float32)
    x = jnp.zeros_like(y)
    rate = 0.3
    out = dp.fused_dropout_add(key, x, y, rate, interpret=True)
    arr = np.asarray(out)
    kept = arr != 0.0
    # drop fraction within 3 sigma of the binomial
    n = arr.size
    sigma = np.sqrt(rate * (1 - rate) / n)
    assert abs((~kept).mean() - rate) < 4 * sigma
    # kept values are exactly 1/q for the quantized keep prob
    thr, q = dp._thr_q(rate)
    np.testing.assert_allclose(arr[kept], 1.0 / q, rtol=1e-6)


def test_residual_passthrough_and_grads():
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(32, 256), jnp.float32)
    y = jnp.asarray(rng.randn(32, 256), jnp.float32)
    rate = 0.5

    f = lambda x, y: dp.fused_dropout_add(key, x, y, rate,  # noqa: E731
                                          interpret=True)
    out = f(x, y)
    # extract the realized mask from the forward
    thr, q = dp._thr_q(rate)
    mask = np.asarray(out - x) != 0.0

    g = jnp.asarray(rng.randn(32, 256), jnp.float32)
    dx, dy = jax.vjp(f, x, y)[1](g)
    # dx is the untouched cotangent
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(g))
    # dy applies the SAME mask (regenerated from the seed)
    want_dy = np.where(mask, np.asarray(g) / q, 0.0)
    np.testing.assert_allclose(np.asarray(dy), want_dy, rtol=1e-5,
                               atol=1e-6)


def test_fused_dropout_no_residual():
    key = jax.random.PRNGKey(3)
    y = jnp.asarray(np.random.RandomState(4).randn(16, 384),
                    jnp.float32)
    rate = 0.2
    out = dp.fused_dropout(key, y, rate, interpret=True)
    mask = np.asarray(out) != 0.0
    thr, q = dp._thr_q(rate)
    np.testing.assert_allclose(np.asarray(out)[mask],
                               (np.asarray(y) / q)[mask], rtol=1e-5)
    (dy,) = jax.vjp(lambda y: dp.fused_dropout(key, y, rate,
                                               interpret=True), y)[1](y)
    np.testing.assert_allclose(np.asarray(dy)[~mask], 0.0)


def test_rate_zero_and_unsupported_shapes():
    key = jax.random.PRNGKey(5)
    x = jnp.ones((4, 128))
    y = jnp.full((4, 128), 2.0)
    np.testing.assert_array_equal(
        np.asarray(dp.fused_dropout_add(key, x, y, 0.0)), 3.0)
    assert not dp.supported((4, 100), interpret=True)   # lanes
    assert dp.supported((4, 128), interpret=True)


def test_odd_leading_dims_pad():
    key = jax.random.PRNGKey(6)
    y = jnp.ones((3, 7, 128), jnp.float32)       # M=21, pads to _TM
    out = dp.fused_dropout(key, y, 0.4, interpret=True)
    assert out.shape == y.shape


def test_prenorm_residual_integration():
    from openseq2seq_tpu.parts.dropout import dropout_config
    from openseq2seq_tpu.parts.transformer.common import PreNormResidual
    import flax.linen as nn

    class _Id(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return x * 2.0

    mod = PreNormResidual(layer=_Id(), dropout_rate=0.3)
    x = jnp.asarray(np.random.RandomState(7).randn(4, 16, 128),
                    jnp.float32)
    params = mod.init(jax.random.PRNGKey(8), x, train=False)
    dp.FORCE_INTERPRET = True
    try:
        with dropout_config(32, False, fused=True):
            out = mod.apply(params, x, train=True,
                            rngs={"dropout": jax.random.PRNGKey(9)})
            # eval path ignores the flag entirely
            ev = mod.apply(params, x, train=False)
    finally:
        dp.FORCE_INTERPRET = False
    assert out.shape == x.shape
    delta = np.asarray(out - x)        # dropout(2*ln(x)) residuals
    assert (delta == 0.0).any() and (delta != 0.0).any()
    with dropout_config(32, False, fused=False):
        ev_plain = mod.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev_plain))
