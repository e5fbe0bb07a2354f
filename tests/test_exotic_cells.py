"""Exotic recurrent cells + TCN (reference `parts/rnns/{flstm,slstm}.py`,
``WeightDropLayerNormBasicLSTMCell``, `parts/cnns/tcn.py:8`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.parts.rnns.rnn import (FLSTM, LSTM, LayerNormLSTM,
                                            SLSTM,
                                            TemporalConvolutionalLayer)

B, T, D, H = 3, 7, 6, 8


def _run(module, rngs=None):
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([T, T - 2, 3])
    variables = module.init(rngs or jax.random.PRNGKey(0), x, lengths)
    out, state = module.apply(variables, x, lengths,
                              rngs={"dropout": jax.random.PRNGKey(1)})
    return np.asarray(out), state, variables, x, lengths


def test_slstm_shapes_and_gate_independence():
    out, (h, c), variables, x, lengths = _run(SLSTM(H))
    assert out.shape == (B, T, H)
    # masked rows are zeroed past their length
    assert np.all(out[2, 3:] == 0)
    # SLSTM has no recurrent kernel at all (gates from inputs only)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    names = ["/".join(str(getattr(p, "key", p)) for p in path)
             for path, _ in flat]
    assert not any("recurrent" in n for n in names)


def test_flstm_factorization_saves_params():
    full = LSTM(H)
    fact = FLSTM(H, fact_size=4)
    x = jnp.zeros((B, T, D))
    lengths = jnp.full((B,), T)
    n_full = sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(
        full.init(jax.random.PRNGKey(0), x, lengths)))
    n_fact = sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(
        fact.init(jax.random.PRNGKey(0), x, lengths)))
    assert n_fact < n_full
    out, _, _, _, _ = _run(FLSTM(H, fact_size=4))
    assert out.shape == (B, T, H)
    # projected variant narrows the output/hidden dim
    out_p, (h_p, _), _, _, _ = _run(FLSTM(H, fact_size=4, num_proj=5))
    assert out_p.shape == (B, T, 5)
    assert h_p.shape == (B, 5)


def test_layernorm_lstm_normalizes_and_weight_drops():
    out, _, variables, x, lengths = _run(LayerNormLSTM(H))
    assert out.shape == (B, T, H)
    assert np.all(np.isfinite(out))
    # scaling the input by 1000x must NOT blow up the activations
    # (layer norm on the gate pre-activations bounds them)
    mod = LayerNormLSTM(H)
    big, _ = mod.apply(variables, x * 1000.0, lengths,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert float(jnp.max(jnp.abs(big))) < 2.0

    # weight-drop: train=True with keep<1 must differ across rng
    mod_wd = LayerNormLSTM(H, recurrent_weight_keep_prob=0.5, train=True)
    v = mod_wd.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(0)}, x, lengths)
    o1, _ = mod_wd.apply(v, x, lengths,
                         rngs={"dropout": jax.random.PRNGKey(1)})
    o2, _ = mod_wd.apply(v, x, lengths,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_tcn_causality():
    tcn = TemporalConvolutionalLayer(filters=5, kernel_size=3,
                                     dilation=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, T, D), jnp.float32)
    v = tcn.init(jax.random.PRNGKey(0), x)
    y1 = np.asarray(tcn.apply(v, x))
    assert y1.shape == (1, T, 5)
    # perturbing the future must not change the past
    x2 = x.at[0, 4:, :].set(99.0)
    y2 = np.asarray(tcn.apply(v, x2))
    np.testing.assert_allclose(y1[0, :4], y2[0, :4], rtol=1e-6)
    assert not np.allclose(y1[0, 4:], y2[0, 4:])


@pytest.mark.parametrize("core_cell", [
    "BasicSLSTMCell", "FLSTMCell", "WeightDropLayerNormBasicLSTMCell"])
def test_lm_encoder_core_cell_selection(core_cell, tmp_path):
    """The LM encoder honors reference-style core_cell names."""
    from openseq2seq_tpu.data.lm import WKTDataLayer
    from openseq2seq_tpu.decoders import FakeDecoder
    from openseq2seq_tpu.encoders import LMEncoder
    from openseq2seq_tpu.losses import BasicSequenceLoss
    from openseq2seq_tpu.models import LSTMLM

    root = tmp_path / "wkt"
    root.mkdir()
    for split in ("train", "valid", "test"):
        (root / "{}.txt".format(split)).write_text(
            "aa bb cc dd\n" * 40)
    params = {
        "random_seed": 0,
        "num_epochs": 1,
        "logdir": "",
        "batch_size_per_gpu": 4,
        "print_loss_steps": 10,
        "save_checkpoint_steps": None,
        "optimizer": "Adam",
        "optimizer_params": {"learning_rate": 1e-3},
        "encoder": LMEncoder,
        "encoder_params": {
            "emb_size": 8,
            "encoder_layers": 1,
            "encoder_use_skip_connections": False,
            "core_cell": core_cell,
            "core_cell_params": {"num_units": 8, "fact_size": 4},
            "use_cudnn_rnn": False,
            "cudnn_rnn_type": None,
            "weight_tied": False,
            "recurrent_weight_keep_prob": 0.9,
        },
        "decoder": FakeDecoder,
        "decoder_params": {},
        "loss": BasicSequenceLoss,
        "loss_params": {},
        "data_layer": WKTDataLayer,
        "data_layer_params": {
            "data_root": str(root),
            "processed_data_folder": str(tmp_path / "proc"),
            "repeat": True,
            "bptt": 8,
        },
    }
    model = LSTMLM(params=params, mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    _, metrics = jax.jit(model.train_step)(state, device_batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
