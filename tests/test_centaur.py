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
