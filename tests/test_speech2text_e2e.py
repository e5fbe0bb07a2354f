"""End-to-end Speech2Text tests on synthetic toy data — the analogue of
the reference's convergence suite (`open_seq2seq/models/
speech2text_test.py:20-351`)."""
import numpy as np
import pytest

from openseq2seq_tpu.models import Speech2Text
from openseq2seq_tpu.test_utils.test_speech_configs import w2l_test_config
from openseq2seq_tpu.training import trainer
from openseq2seq_tpu.utils.params import nested_update


def _build(toy, mode="train", overrides=None, mesh=None, **cfg_kw):
    base_params, eval_params = w2l_test_config(toy["csv"], toy["vocab"],
                                               **cfg_kw)
    if overrides:
        nested_update(base_params, overrides)
    if mode == "eval":
        nested_update(base_params, eval_params)
    return Speech2Text(params=base_params, mode=mode, mesh=mesh)


def test_build_and_single_step(toy_speech_data):
    model = _build(toy_speech_data, num_epochs=1)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    assert batch["source_tensors"][0].ndim == 3
    state = model.init_state(batch)
    import jax
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


@pytest.mark.slow
def test_convergence(toy_speech_data):
    """Real training run: loss must drop well below the initial value and
    WER must be small (reference thresholds: loss<5.0, WER<0.1 on its toy
    set, `speech2text_ds2_test.py:26-27`)."""
    train_model = _build(toy_speech_data, "train", num_epochs=150)
    eval_model = _build(toy_speech_data, "eval", num_epochs=150)
    result = trainer.train(train_model, eval_model=None)
    final_loss = float(result["last_metrics"]["loss"])
    assert final_loss < 1.0, "loss did not converge: {}".format(final_loss)
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert metrics["Eval WER"] < 0.1, metrics  # reference bar (<0.1)


@pytest.mark.slow
def test_convergence_mixed_precision(toy_speech_data):
    """bf16 compute path ('mixed') must converge too."""
    train_model = _build(toy_speech_data, "train", dtype="mixed",
                         num_epochs=150)
    result = trainer.train(train_model)
    assert float(result["last_metrics"]["loss"]) < 2.0


@pytest.mark.slow
def test_convergence_quartznet(toy_speech_data):
    """The depthwise-separable (QuartzNet) encoder path must converge
    on the toy set too (reference quartznet15x5 recipe's conv type)."""
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        quartznet_test_config)
    base_params, _ = quartznet_test_config(
        toy_speech_data["csv"], toy_speech_data["vocab"], num_epochs=150)
    train_model = Speech2Text(params=base_params, mode="train")
    result = trainer.train(train_model)
    final_loss = float(result["last_metrics"]["loss"])
    assert final_loss < 1.5, "loss did not converge: {}".format(final_loss)


@pytest.mark.slow
def test_convergence_conformer(toy_speech_data):
    """The Conformer encoder (rel-pos attention + depthwise conv module,
    beyond-parity — see encoders/conformer_encoder.py) must converge on
    the toy set through the unchanged Speech2Text stack."""
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        conformer_test_config)
    base_params, eval_params = conformer_test_config(
        toy_speech_data["csv"], toy_speech_data["vocab"], num_epochs=150)
    train_model = Speech2Text(params=base_params, mode="train")
    result = trainer.train(train_model)
    final_loss = float(result["last_metrics"]["loss"])
    assert final_loss < 1.0, "loss did not converge: {}".format(final_loss)
    nested_update(base_params, eval_params)
    eval_model = Speech2Text(params=base_params, mode="eval")
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert metrics["Eval WER"] < 0.1, metrics


def test_regularizer_increases_loss(toy_speech_data):
    """L2 regularization must inflate the reported loss (reference
    regularizer_test, `speech2text_test.py:68-87`)."""
    import jax
    m_plain = _build(toy_speech_data, num_epochs=1)
    m_reg = _build(toy_speech_data, num_epochs=1,
                   overrides={"regularizer": "l2",
                              "regularizer_params": {"scale": 1.0}})
    dl = m_plain.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    s1 = m_plain.init_state(batch)
    s2 = m_reg.init_state(batch)
    rng = jax.random.PRNGKey(0)
    l1, _ = m_plain.loss_fn(s1.params, s1.model_state, device_batch, rng)
    l2, _ = m_reg.loss_fn(s1.params, s2.model_state, device_batch, rng)
    assert float(l2) > float(l1)


def test_eval_pipeline_wer_counts(toy_speech_data):
    """finalize_evaluation aggregates edit distances over batches."""
    model = _build(toy_speech_data, "eval")
    fake_results = [(3, 10, 1.0, 2), (1, 10, 2.0, 2)]
    metrics = model.finalize_evaluation(fake_results)
    assert metrics["Eval WER"] == pytest.approx(4 / 20)
    assert metrics["eval_loss"] == pytest.approx((1.0 * 2 + 2.0 * 2) / 4 / 2)


@pytest.mark.slow
def test_convergence_bf16_features(toy_speech_data):
    """The flagship recipe ships features_dtype='bfloat16' (half the
    H2D wire size); the full toy pipeline must converge identically
    through bf16-collated features + 'mixed' compute."""
    train_model = _build(
        toy_speech_data, "train", dtype="mixed", num_epochs=150,
        overrides={"data_layer_params": {"features_dtype": "bfloat16"}})
    result = trainer.train(train_model)
    final_loss = float(result["last_metrics"]["loss"])
    assert final_loss < 1.0, final_loss
