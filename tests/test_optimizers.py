import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openseq2seq_tpu.optimizers import (AutomaticLossScaler, build_optimizer,
                                        check_grads, larc, novograd,
                                        scale_by_novograd)


def test_novograd_first_step_math():
    """First step: v = ||g||^2, m = g/sqrt(v+eps), update = -lr*m
    (reference novograd.py:102-126 update rule)."""
    lr, beta1, beta2, eps = 0.1, 0.95, 0.98, 1e-8
    params = {"w": jnp.array([1.0, 2.0])}
    grads = {"w": jnp.array([0.3, -0.4])}
    tx = novograd(lr, beta1=beta1, beta2=beta2, epsilon=eps)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    g = np.array([0.3, -0.4])
    v = np.sum(g ** 2)
    expected = -lr * g / np.sqrt(v + eps)
    np.testing.assert_allclose(np.asarray(updates["w"]), expected, rtol=1e-5)


def test_novograd_second_step_math():
    lr, beta1, beta2, eps = 0.1, 0.9, 0.5, 1e-8
    params = {"w": jnp.array([1.0])}
    g1, g2 = np.array([1.0]), np.array([2.0])
    tx = novograd(lr, beta1=beta1, beta2=beta2, epsilon=eps)
    state = tx.init(params)
    u1, state = tx.update({"w": jnp.asarray(g1)}, state, params)
    u2, state = tx.update({"w": jnp.asarray(g2)}, state, params)
    v1 = np.sum(g1 ** 2)
    m1 = g1 / np.sqrt(v1 + eps)
    v2 = v1 * beta2 + np.sum(g2 ** 2) * (1 - beta2)
    m2 = beta1 * m1 + g2 / np.sqrt(v2 + eps)
    np.testing.assert_allclose(np.asarray(u2["w"]), -lr * m2, rtol=1e-5)


def test_novograd_weight_decay_and_averaging():
    lr, beta1, beta2, eps, wd = 1.0, 0.9, 0.5, 1e-8, 0.1
    params = {"w": jnp.array([2.0])}
    g = np.array([1.0])
    tx = novograd(lr, beta1=beta1, beta2=beta2, epsilon=eps,
                  weight_decay=wd, grad_averaging=True)
    state = tx.init(params)
    u, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    v = np.sum(g ** 2)
    ghat = (g / np.sqrt(v + eps) + wd * 2.0) * (1 - beta1)
    np.testing.assert_allclose(np.asarray(u["w"]), -lr * ghat, rtol=1e-5)


def test_larc_clip_mode():
    """clip: g *= min(eta*||w||/(lr*(||g||+eps)), 1)."""
    eta, lr = 0.001, 0.1
    params = {"w": jnp.array([3.0, 4.0])}       # ||w|| = 5
    grads = {"w": jnp.array([30.0, 40.0])}      # ||g|| = 50
    tx = larc(larc_eta=eta, larc_mode="clip", learning_rate=lr)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    factor = min(eta * 5.0 / (lr * (50.0 + 1e-7)), 1.0)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               np.array([30.0, 40.0]) * factor, rtol=1e-5)


def test_larc_scale_mode():
    eta = 0.01
    params = {"w": jnp.array([3.0, 4.0])}
    grads = {"w": jnp.array([30.0, 40.0])}
    tx = larc(larc_eta=eta, larc_mode="scale")
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    factor = eta * 5.0 / (50.0 + 1e-7)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               np.array([30.0, 40.0]) * factor, rtol=1e-5)


def test_iter_size_accumulation_equivalence():
    """iter_size=N over N microbatches == one step on the mean gradient
    (reference IterSizeTests, `optimizers/optimizers_test.py:14`)."""
    params = {"w": jnp.ones(4)}
    grads = [{"w": jnp.asarray(np.random.RandomState(i).randn(4)
                               .astype(np.float32))} for i in range(4)]
    tx_acc = build_optimizer("SGD", {"learning_rate": 0.5}, iter_size=4)
    state = tx_acc.init(params)
    p = params
    for g in grads:
        updates, state = tx_acc.update(g, state, p)
        p = optax.apply_updates(p, updates)
    mean_grad = np.mean([np.asarray(g["w"]) for g in grads], axis=0)
    expected = np.ones(4) - 0.5 * mean_grad
    np.testing.assert_allclose(np.asarray(p["w"]), expected, rtol=1e-5)


def test_build_optimizer_with_policy_and_clip():
    tx = build_optimizer("Momentum", {"learning_rate": 1.0, "momentum": 0.9},
                         lr_policy="poly_decay",
                         lr_policy_params={"decay_steps": 100},
                         max_grad_norm=1.0)
    params = {"w": jnp.array([100.0])}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.array([100.0])}, state, params)
    # clipped to norm 1, then lr at step 0 == 1.0
    np.testing.assert_allclose(np.asarray(updates["w"]), [-1.0], rtol=1e-5)


def test_unknown_optimizer():
    with pytest.raises(ValueError, match="Unknown optimizer"):
        build_optimizer("NopeGrad", {"learning_rate": 1.0})


# ---------------------------------------------------------------------------
# loss scaling
# ---------------------------------------------------------------------------

def test_check_grads_detects_nonfinite():
    has_nan, amax = check_grads({"a": jnp.array([1.0, jnp.nan])})
    assert bool(has_nan)
    has_nan, amax = check_grads({"a": jnp.array([1.0, 2.0])})
    assert not bool(has_nan)
    assert float(amax) == pytest.approx(2.0)


def test_backoff_scaler_halves_on_overflow():
    scaler = AutomaticLossScaler("Backoff", {"scale_max": 1024.0})
    state = scaler.init()
    assert float(state.scale) == 1024.0
    state = scaler.update(state, jnp.bool_(True), jnp.float32(1.0))
    assert float(state.scale) == 512.0
    state = scaler.update(state, jnp.bool_(True), jnp.float32(jnp.inf))
    assert float(state.scale) == 256.0


def test_backoff_scaler_grows_after_window():
    scaler = AutomaticLossScaler("Backoff", {"scale_max": 1024.0,
                                             "step_window": 3})
    state = scaler.init()
    state = scaler.update(state, jnp.bool_(True), jnp.float32(1.0))  # 512
    for _ in range(2):
        state = scaler.update(state, jnp.bool_(False), jnp.float32(1.0))
    assert float(state.scale) == 512.0
    state = scaler.update(state, jnp.bool_(False), jnp.float32(1.0))
    assert float(state.scale) == 1024.0


def test_logmax_scaler_runs_and_clips():
    scaler = AutomaticLossScaler("LogMax", {"scale_max": 4096.0})
    state = scaler.init()
    for _ in range(10):
        state = scaler.update(state, jnp.bool_(False), jnp.float32(1e-3))
    assert 1.0 <= float(state.scale) <= 4096.0


def test_unknown_scaler_rejected():
    with pytest.raises(ValueError):
        AutomaticLossScaler("wat")
