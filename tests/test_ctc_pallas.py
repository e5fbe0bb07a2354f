"""Pallas CTC kernels must match the XLA-scan reference (values and
gradients), run in interpreter mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.ops.ctc import ctc_loss
from openseq2seq_tpu.ops.ctc_pallas import ctc_loss_pallas


def _case(rng, B=3, T=16, L=5, V=8):
    logits = rng.randn(B, T, V).astype(np.float32)
    logit_lens = rng.randint(2 * L, T + 1, size=B).astype(np.int32)
    labels = rng.randint(0, V - 1, size=(B, L)).astype(np.int32)
    label_lens = rng.randint(1, L + 1, size=B).astype(np.int32)
    return (jnp.asarray(logits), jnp.asarray(logit_lens),
            jnp.asarray(labels), jnp.asarray(label_lens))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_ctc_matches_reference_values(seed):
    args = _case(np.random.RandomState(seed))
    ref = ctc_loss(*args, average_across_batch=False)
    pal = ctc_loss_pallas(*args, average_across_batch=False,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_ctc_matches_reference_grads():
    args = _case(np.random.RandomState(3), B=2, T=12, L=4, V=6)

    def ref_sum(lg):
        return jnp.sum(ctc_loss(lg, *args[1:],
                                average_across_batch=False))

    def pal_sum(lg):
        return jnp.sum(ctc_loss_pallas(lg, *args[1:],
                                       average_across_batch=False,
                                       interpret=True))

    g_ref = jax.grad(ref_sum)(args[0])
    g_pal = jax.grad(pal_sum)(args[0])
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_pallas_ctc_infeasible_rows():
    V = 5
    logits = jnp.zeros((2, 3, V))
    labels = jnp.asarray([[1, 1, 2, 2], [1, 2, 0, 0]])
    label_lens = jnp.asarray([4, 2])
    logit_lens = jnp.asarray([3, 3])
    nll = ctc_loss_pallas(logits, logit_lens, labels, label_lens,
                          average_across_batch=False, interpret=True)
    assert float(nll[0]) == 0.0
    assert float(nll[1]) > 0.0


def test_pallas_ctc_empty_label():
    V, T = 4, 5
    logits = jnp.asarray(np.random.RandomState(4).randn(1, T, V),
                         jnp.float32)
    ref = ctc_loss(logits, jnp.asarray([T]),
                   jnp.zeros((1, 3), jnp.int32), jnp.asarray([0]),
                   average_across_batch=False)
    pal = ctc_loss_pallas(logits, jnp.asarray([T]),
                          jnp.zeros((1, 3), jnp.int32),
                          jnp.asarray([0]),
                          average_across_batch=False, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-4)


def test_pallas_ctc_chunked_r8_values_and_grads():
    """B=8 exercises the R=8 forward path; T=300 crosses the 128-frame
    chunk boundary (alpha carried in scratch across grid steps)."""
    args = _case(np.random.RandomState(5), B=8, T=300, L=12, V=10)

    def ref_sum(lg):
        return jnp.sum(ctc_loss(lg, *args[1:],
                                average_across_batch=False))

    def pal_sum(lg):
        return jnp.sum(ctc_loss_pallas(lg, *args[1:],
                                       average_across_batch=False,
                                       interpret=True))

    np.testing.assert_allclose(float(pal_sum(args[0])),
                               float(ref_sum(args[0])), rtol=1e-4)
    g_ref = jax.grad(ref_sum)(args[0])
    g_pal = jax.grad(pal_sum)(args[0])
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_pallas_ctc_unaligned_t():
    """T not a multiple of 8 exercises the T padding path."""
    args = _case(np.random.RandomState(6), B=2, T=19, L=4, V=6)
    ref = ctc_loss(*args, average_across_batch=False)
    pal = ctc_loss_pallas(*args, average_across_batch=False,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_ctc_infeasible_rows_grads_finite():
    """Gradients of infeasible rows must be exactly zero (the loss is
    masked) and every other gradient finite."""
    V = 5
    logits = jnp.asarray(np.random.RandomState(7).randn(2, 3, V),
                         jnp.float32)
    labels = jnp.asarray([[1, 1, 2, 2], [1, 2, 0, 0]])
    label_lens = jnp.asarray([4, 2])
    logit_lens = jnp.asarray([3, 3])

    def loss(lg):
        return jnp.sum(ctc_loss_pallas(lg, logit_lens, labels,
                                       label_lens,
                                       average_across_batch=False,
                                       interpret=True))

    g = np.asarray(jax.grad(loss)(logits))
    assert np.all(np.isfinite(g))
    np.testing.assert_array_equal(g[0], 0.0)   # infeasible row
    assert np.abs(g[1]).max() > 0.0
