import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openseq2seq_tpu.ops.ctc import ctc_greedy_decode, ctc_loss


def _random_case(rng, B=4, T=20, L=6, V=8):
    logits = rng.randn(B, T, V).astype(np.float32)
    logit_lens = rng.randint(L + 2, T + 1, size=B).astype(np.int32)
    labels = rng.randint(0, V - 1, size=(B, L)).astype(np.int32)
    label_lens = rng.randint(1, L + 1, size=B).astype(np.int32)
    return logits, logit_lens, labels, label_lens


def test_ctc_loss_matches_optax():
    """Cross-check the alpha recursion against optax's reference
    implementation (blank conventions aligned by padding)."""
    rng = np.random.RandomState(0)
    logits, logit_lens, labels, label_lens = _random_case(rng)
    B, T, V = logits.shape
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens),
                    blank_id=V - 1, average_across_batch=False)
    # optax.ctc_loss wants blank_id and paddings
    logitpad = (np.arange(T)[None, :] >= logit_lens[:, None]).astype(np.float32)
    labelpad = (np.arange(labels.shape[1])[None, :] >=
                label_lens[:, None]).astype(np.float32)
    ref = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logitpad),
                         jnp.asarray(labels), jnp.asarray(labelpad),
                         blank_id=V - 1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ctc_loss_gradients_match_optax():
    rng = np.random.RandomState(1)
    logits, logit_lens, labels, label_lens = _random_case(rng, B=2, T=12,
                                                          L=4, V=6)
    B, T, V = logits.shape
    logitpad = (np.arange(T)[None, :] >= logit_lens[:, None]).astype(np.float32)
    labelpad = (np.arange(labels.shape[1])[None, :] >=
                label_lens[:, None]).astype(np.float32)

    def ours(lg):
        return jnp.sum(ctc_loss(lg, jnp.asarray(logit_lens),
                                jnp.asarray(labels),
                                jnp.asarray(label_lens),
                                blank_id=V - 1, average_across_batch=False))

    def ref(lg):
        return jnp.sum(optax.ctc_loss(lg, jnp.asarray(logitpad),
                                      jnp.asarray(labels),
                                      jnp.asarray(labelpad), blank_id=V - 1))

    g1 = jax.grad(ours)(jnp.asarray(logits))
    g2 = jax.grad(ref)(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_ctc_loss_infeasible_rows_zeroed():
    """Rows whose labels can't fit in logit_length get exactly 0 loss
    (reference ignore_longer_outputs_than_inputs, ctc_loss.py:78-86)."""
    V = 5
    logits = jnp.zeros((2, 3, V))
    labels = jnp.asarray([[1, 1, 2, 2], [1, 2, 0, 0]])  # row0 needs >= 6
    label_lens = jnp.asarray([4, 2])
    logit_lens = jnp.asarray([3, 3])
    nll = ctc_loss(logits, logit_lens, labels, label_lens,
                   average_across_batch=False)
    assert float(nll[0]) == 0.0
    assert float(nll[1]) > 0.0
    # gradient for the infeasible row must be exactly zero
    g = jax.grad(lambda lg: jnp.sum(ctc_loss(
        lg, logit_lens, labels, label_lens,
        average_across_batch=False)))(logits)
    assert float(jnp.max(jnp.abs(g[0]))) == 0.0
    assert float(jnp.max(jnp.abs(g[1]))) > 0.0


def test_ctc_loss_empty_label():
    V = 4
    T = 5
    logits = jnp.asarray(np.random.RandomState(2).randn(1, T, V),
                         jnp.float32)
    nll = ctc_loss(logits, jnp.asarray([T]), jnp.zeros((1, 3), jnp.int32),
                   jnp.asarray([0]), average_across_batch=False)
    # should equal -sum_t log p(blank)
    logp = jax.nn.log_softmax(logits, -1)
    expected = -float(jnp.sum(logp[0, :, V - 1]))
    assert float(nll[0]) == pytest.approx(expected, rel=1e-5)


def test_greedy_decode_collapses_and_strips_blanks():
    V = 4  # blank = 3
    # sequence: a a blank b b blank blank c -> "a b c" = [0, 1, 2]
    path = [0, 0, 3, 1, 1, 3, 3, 2]
    logits = np.full((1, len(path), V), -10.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 10.0
    ids, lens = ctc_greedy_decode(jnp.asarray(logits),
                                  jnp.asarray([len(path)]))
    assert int(lens[0]) == 3
    assert np.asarray(ids)[0, :3].tolist() == [0, 1, 2]
    assert np.all(np.asarray(ids)[0, 3:] == -1)


def test_greedy_decode_respects_length():
    V = 3
    path = [0, 2, 1, 1]
    logits = np.full((1, 4, V), -10.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 10.0
    ids, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([2]))
    # only first two frames count: "0, blank" -> [0]
    assert int(lens[0]) == 1
    assert int(np.asarray(ids)[0, 0]) == 0


def test_greedy_decode_repeated_separated_by_blank():
    V = 3
    path = [0, 2, 0]  # a blank a -> "a a"
    logits = np.full((1, 3, V), -10.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 10.0
    ids, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([3]))
    assert int(lens[0]) == 2
    assert np.asarray(ids)[0, :2].tolist() == [0, 0]
