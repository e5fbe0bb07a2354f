import math

import numpy as np
import pytest

from openseq2seq_tpu.optimizers import lr_policies as lrp


def test_fixed():
    assert float(lrp.fixed_lr(100, 0.1)) == pytest.approx(0.1)


def test_piecewise_constant():
    import jax.numpy as jnp
    f = lambda s: float(lrp.piecewise_constant(  # noqa: E731
        jnp.int32(s), 1.0, [10, 20], [0.5, 0.1]))
    assert f(0) == pytest.approx(1.0)
    assert f(10) == pytest.approx(0.5)
    assert f(19) == pytest.approx(0.5)
    assert f(25) == pytest.approx(0.1)


def test_piecewise_epochs():
    import jax.numpy as jnp
    v = float(lrp.piecewise_constant(jnp.int32(15), 1.0, [2], [0.5],
                                     steps_per_epoch=10))
    assert v == pytest.approx(1.0)


def test_exp_decay_staircase():
    v = float(lrp.exp_decay(25, 1.0, decay_steps=10, decay_rate=0.5,
                            use_staircase_decay=True, begin_decay_at=5,
                            min_lr=0.0))
    assert v == pytest.approx(1.0 * 0.5 ** 2)


def test_exp_decay_min_lr():
    v = float(lrp.exp_decay(10000, 1.0, decay_steps=10, decay_rate=0.5,
                            use_staircase_decay=False, min_lr=0.3))
    assert v == pytest.approx(0.3)


def test_poly_decay_endpoints():
    assert float(lrp.poly_decay(0, 1.0, 100)) == pytest.approx(1.0)
    assert float(lrp.poly_decay(50, 1.0, 100)) == pytest.approx(0.5)
    assert float(lrp.poly_decay(100, 1.0, 100)) == pytest.approx(0.0, abs=1e-7)
    assert float(lrp.poly_decay(500, 1.0, 100)) == pytest.approx(0.0, abs=1e-7)


def test_poly_decay_warmup():
    assert float(lrp.poly_decay(5, 1.0, 100, warmup_steps=10)) == \
        pytest.approx(0.5 * (1 - 5 / 100), rel=1e-5)


def test_cosine_decay():
    assert float(lrp.cosine_decay(0, 2.0, 100)) == pytest.approx(2.0)
    assert float(lrp.cosine_decay(100, 2.0, 100)) == pytest.approx(0.0,
                                                                   abs=1e-6)
    assert float(lrp.cosine_decay(50, 2.0, 100)) == pytest.approx(1.0)


def test_transformer_policy_matches_formula():
    lr, d_model, warmup = 2.0, 512, 4000
    for step in (0, 100, 4000, 100000):
        expected = lr * d_model ** -0.5 * min(
            (step + 1) * warmup ** -1.5, (step + 1) ** -0.5)
        got = float(lrp.transformer_policy(step, lr, d_model, warmup))
        assert got == pytest.approx(expected, rel=1e-5)


def test_transformer_policy_hat():
    v = float(lrp.transformer_policy(4000, 100.0, 512, 4000, max_lr=0.01))
    assert v == pytest.approx(0.01)


def test_inv_poly_decay_hits_min_lr():
    v = float(lrp.inv_poly_decay(1000, 1.0, decay_steps=1000, min_lr=0.01,
                                 power=2.0))
    assert v == pytest.approx(0.01, rel=1e-4)


def test_make_lr_schedule_by_name():
    sched = lrp.make_lr_schedule("poly_decay",
                                 {"learning_rate": 1.0, "decay_steps": 10})
    assert float(sched(5)) == pytest.approx(0.5)


def test_make_lr_schedule_unknown():
    with pytest.raises(ValueError, match="Unknown lr_policy"):
        lrp.make_lr_schedule("nope", {})


def test_decay_steps_defaults_to_total_steps(toy_speech_data):
    """A decay policy without explicit decay_steps decays over the FULL
    training run (num_epochs x steps/epoch), minus warmup — reference
    `models/model.py:480-495` defaulting."""
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        w2l_test_config)

    params, _ = w2l_test_config(toy_speech_data["csv"],
                                toy_speech_data["vocab"], num_epochs=7)
    params["lr_policy"] = "poly_decay"
    params["lr_policy_params"] = {"learning_rate": 0.1, "power": 2.0,
                                  "warmup_steps": 3}
    model = Speech2Text(params=params, mode="train")
    resolved = model._resolved_lr_policy_params()
    total = 7 * model.steps_in_epoch
    assert resolved["begin_decay_at"] == 3
    assert resolved["decay_steps"] == total - 3
    # the schedule the optimizer uses hits min_lr (0) at the last step
    sched = lrp.make_lr_schedule("poly_decay", resolved)
    assert float(sched(total)) == pytest.approx(0.0, abs=1e-7)
    assert float(sched(total // 2)) > 0.0
    # an explicit decay_steps is never overridden
    params["lr_policy_params"]["decay_steps"] = 11
    model2 = Speech2Text(params=params, mode="train")
    assert model2._resolved_lr_policy_params()["decay_steps"] == 11


def test_steps_per_epoch_defaults_for_piecewise(toy_speech_data):
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        w2l_test_config)

    params, _ = w2l_test_config(toy_speech_data["csv"],
                                toy_speech_data["vocab"], num_epochs=4)
    params["lr_policy"] = "piecewise_constant"
    params["lr_policy_params"] = {"learning_rate": 0.1,
                                  "boundaries": [2, 3],
                                  "decay_rates": [0.1, 0.01]}
    model = Speech2Text(params=params, mode="train")
    resolved = model._resolved_lr_policy_params()
    assert resolved["steps_per_epoch"] == model.steps_in_epoch
