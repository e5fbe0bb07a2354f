"""LAS encoder, JCA decoder + multi-task loss, SpeechCommands layer."""
import numpy as np
import pytest

import jax

from openseq2seq_tpu.decoders import (FullyConnectedCTCDecoder,
                                      JointCTCAttentionDecoder,
                                      ListenAttendSpellDecoder)
from openseq2seq_tpu.encoders import ListenAttendSpellEncoder
from openseq2seq_tpu.losses import MultiTaskCTCEntropyLoss
from openseq2seq_tpu.models import Speech2Text
from openseq2seq_tpu.test_utils.test_speech_configs import w2l_test_config


def _las_jca_config(toy):
    base_params, _ = w2l_test_config(toy["csv"], toy["vocab"],
                                     num_epochs=1)
    base_params["data_layer_params"]["autoregressive"] = True
    base_params["encoder"] = ListenAttendSpellEncoder
    base_params["encoder_params"] = {
        "convnet_layers": [
            {"type": "conv1d", "repeat": 1, "kernel_size": [7],
             "stride": [2], "num_channels": 32, "padding": "SAME"},
        ],
        "recurrent_layers": [
            {"type": "lstm", "num_units": 32, "pool": 2},
            {"type": "lstm", "num_units": 32},
        ],
        "activation_fn": "relu",
        "dropout_keep_prob": 1.0,
    }
    base_params["decoder"] = JointCTCAttentionDecoder
    base_params["decoder_params"] = {
        "ctc_decoder": FullyConnectedCTCDecoder,
        "attn_decoder": ListenAttendSpellDecoder,
        "ctc_decoder_params": {"use_language_model": False},
        "attn_decoder_params": {
            "tgt_emb_size": 32,
            "attention_params": {
                "attention_dim": 32,
                "attention_type": "chorowski",
                "use_coverage": True,
                "num_heads": 1,
                "plot_attention": False,
            },
            "rnn_type": "lstm",
            "hidden_dim": 32,
            "num_layers": 1,
            "dropout_keep_prob": 0.9,
        },
        "beam_search_params": {"beam_width": 2},
        "language_model_params": {},
        "GO_SYMBOL": 9,
        "END_SYMBOL": 10,
    }
    base_params["loss"] = MultiTaskCTCEntropyLoss
    base_params["loss_params"] = {
        "ctc_loss_params": {},
        "seq_loss_params": {},
        "lambda_value": 0.5,
    }
    return base_params


def test_las_jca_train_step(toy_speech_data):
    model = Speech2Text(params=_las_jca_config(toy_speech_data),
                        mode="train")
    dl = model.get_data_layer()
    # autoregressive vocab: chars + <S>/</S>
    assert dl.params["tgt_vocab_size"] == 11
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_speech_commands_layer(tmp_path, toy_speech_data):
    import shutil
    from openseq2seq_tpu.data.speech2text import SpeechCommandsDataLayer
    rows = []
    for i in range(4):
        rows.append("toy_{}.wav,{}".format(i, i % 2))
    csv = tmp_path / "commands.csv"
    csv.write_text("\n".join(rows) + "\n")
    params = {
        "mode": "train",
        "dataset_files": [str(csv)],
        "dataset_location": toy_speech_data["dir"],
        "num_audio_features": 32,
        "audio_length": 1000,
        "num_labels": 2,
        "model_format": "jasper",
        "batch_size": 2,
        "augment_data": True,
        "shuffle": True,
    }
    dl = SpeechCommandsDataLayer(params, model=None)
    assert dl.get_size_in_samples() == 4
    batch = next(iter(dl.iterate_one_epoch()))
    x, x_len = batch["source_tensors"]
    assert x.shape[0] == 2 and x.shape[2] == 32
    assert set(np.asarray(batch["target_tensors"][0]).tolist()) <= {0, 1}


def _las_config(toy, num_epochs=1):
    """Pure-LAS model: LAS encoder + reference-schema LAS decoder +
    sequence CE (no CTC head)."""
    from openseq2seq_tpu.losses import BasicSequenceLoss
    base_params, _ = w2l_test_config(toy["csv"], toy["vocab"],
                                     num_epochs=num_epochs)
    base_params["data_layer_params"]["autoregressive"] = True
    base_params["encoder"] = ListenAttendSpellEncoder
    base_params["encoder_params"] = {
        "convnet_layers": [
            {"type": "conv1d", "repeat": 1, "kernel_size": [7],
             "stride": [2], "num_channels": 48, "padding": "SAME"},
        ],
        "recurrent_layers": [
            {"type": "lstm", "num_units": 48, "pool": 2},
        ],
        "activation_fn": "relu",
        "dropout_keep_prob": 1.0,
    }
    base_params["decoder"] = ListenAttendSpellDecoder
    base_params["decoder_params"] = {
        "GO_SYMBOL": 9,
        "END_SYMBOL": 10,
        "tgt_emb_size": 48,
        "attention_params": {
            "attention_dim": 48,
            "attention_type": "chorowski",
            "use_coverage": False,
            "num_heads": 2,
            "plot_attention": True,
        },
        "rnn_type": "lstm",
        "hidden_dim": 48,
        "num_layers": 1,
        "pos_embedding": True,
        "dropout_keep_prob": 1.0,
        "beam_width": 2,
    }
    base_params["loss"] = BasicSequenceLoss
    base_params["loss_params"] = {}
    base_params["optimizer_params"] = {"learning_rate": 1e-3}
    return base_params


def test_las_train_step_and_alignments(toy_speech_data):
    model = Speech2Text(params=_las_config(toy_speech_data),
                        mode="train")
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # plot_attention surfaces per-step alignments over memory positions
    out = jax.jit(model.eval_step)(state, device_batch)
    align = np.asarray(out["outputs"]["decoder_output"]["alignments"])
    assert align.ndim == 3
    np.testing.assert_allclose(align.sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_las_toy_convergence(toy_speech_data):
    """The speller must learn the 10-utterance toy set (loss falls well
    below the initial CE; reference-style convergence bar)."""
    from openseq2seq_tpu.training import trainer
    model = Speech2Text(params=_las_config(toy_speech_data,
                                           num_epochs=150),
                        mode="train")
    result = trainer.train(model)
    assert result["last_metrics"]["loss"] < 0.5


def test_las_beam_infer(toy_speech_data):
    """Regression: beam_width>1 inference must run (the beam search
    tiles encoder memory/keys/mask through its cache)."""
    cfg = _las_config(toy_speech_data)
    cfg["decoder_params"]["beam_width"] = 3
    train_model = Speech2Text(params=cfg, mode="train")
    batch = next(iter(train_model.get_data_layer().iterate_one_epoch()))
    state = train_model.init_state(batch)

    infer_model = Speech2Text(params=dict(cfg), mode="infer")
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    device_batch.pop("target_tensors")
    out = jax.jit(infer_model.eval_step)(state, device_batch)
    ids, lengths = out["outputs"]["decoder_output"]["outputs"]
    assert np.asarray(ids).shape[0] == 10
    assert np.all(np.asarray(lengths) >= 0)


def test_las_infer_mode_init(toy_speech_data):
    """Regression: init_state directly on an INFER-mode LAS model (the
    run.py eval/infer path) with beam_width>1 must build cleanly."""
    cfg = _las_config(toy_speech_data)
    cfg["decoder_params"]["beam_width"] = 3
    m = Speech2Text(params=cfg, mode="infer")
    batch = next(iter(m.get_data_layer().iterate_one_epoch()))
    batch.pop("target_tensors", None)
    state = m.init_state(batch)
    out = jax.jit(m.eval_step)(
        state, jax.tree_util.tree_map(np.asarray, batch))
    assert np.asarray(
        out["outputs"]["decoder_output"]["outputs"][0]).shape[0] == 10
