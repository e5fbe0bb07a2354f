"""Centaur conv-attention TTS track."""
import numpy as np
import pytest

import jax

from openseq2seq_tpu.decoders import CentaurDecoder
from openseq2seq_tpu.encoders import CentaurEncoder
from openseq2seq_tpu.losses import Text2SpeechLoss
from openseq2seq_tpu.models import Text2Speech
from tests.test_text2speech import toy_lj, _config as tacotron_config


def _centaur_config(toy):
    cfg = tacotron_config(toy)
    cfg["encoder"] = CentaurEncoder
    cfg["encoder_params"] = {
        "embedding_size": 16,
        "output_size": 32,
        "conv_layers": [
            {"kernel_size": [3], "stride": [1], "num_channels": 32,
             "padding": "SAME"},
        ],
        "cnn_dropout_prob": 0.1,
    }
    cfg["decoder"] = CentaurDecoder
    cfg["decoder_params"] = {
        "prenet_layers": 1,
        "prenet_hidden_size": 16,
        "hidden_size": 32,
        "conv_layers": [
            {"kernel_size": [3], "stride": [1], "num_channels": 32,
             "padding": "CAUSAL"},
            {"kernel_size": [3], "stride": [1], "num_channels": 32,
             "padding": "CAUSAL"},
        ],
        "mag_conv_layers": None,
        "attention_dropout": 0.1,
        "layer_postprocess_dropout": 0.1,
        "attention_heads": 2,
        "reduction_factor": 1,
        "infer_max_steps": 24,
    }
    return cfg


def test_centaur_train_step_and_infer(toy_lj):
    model = Text2Speech(params=_centaur_config(toy_lj), mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    infer_model = Text2Speech(params=_centaur_config(toy_lj),
                              mode="infer")
    infer_batch = dict(device_batch)
    infer_batch.pop("target_tensors")
    out = jax.jit(infer_model.eval_step)(new_state, infer_batch)
    spec, lengths = out["outputs"]["decoder_output"]["outputs"]
    assert spec.shape[2] == 20
    assert np.all(np.asarray(lengths) >= 1)


def test_centaur_windowed_monotonic_attention(toy_lj):
    """window_size=1 / back_step_size=0 on a single head confines each
    inference step's attention to exactly one encoder position — the
    returned alignment rows must be one-hot (reference
    `parts/transformer/attention_layer.py:160-181` forcing)."""
    cfg = _centaur_config(toy_lj)
    cfg["decoder_params"]["attention_heads"] = 1
    cfg["decoder_params"]["window_size"] = 1
    cfg["decoder_params"]["back_step_size"] = 0
    model = Text2Speech(params=cfg, mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)

    infer_model = Text2Speech(params=cfg, mode="infer")
    infer_batch = dict(device_batch)
    infer_batch.pop("target_tensors")
    out = jax.jit(infer_model.eval_step)(state, infer_batch)
    align = np.asarray(out["outputs"]["decoder_output"]["alignments"])
    assert align.ndim == 3                      # (B, T_groups, S)
    np.testing.assert_allclose(align.sum(-1), 1.0, rtol=1e-4)
    assert np.all(align.max(axis=-1) > 0.999)

    # without forcing, inference attention is generally soft
    cfg2 = _centaur_config(toy_lj)
    cfg2["decoder_params"]["attention_heads"] = 1
    free_model = Text2Speech(params=cfg2, mode="infer")
    out2 = jax.jit(free_model.eval_step)(state, infer_batch)
    align2 = np.asarray(out2["outputs"]["decoder_output"]["alignments"])
    assert align2.max(axis=-1).min() < 0.999
