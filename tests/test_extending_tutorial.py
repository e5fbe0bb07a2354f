"""The `docs/extending-walkthrough.md` tutorial must stay true: its
GatedConvEncoder (shipped verbatim as
`encoders/gatedconv_encoder.py`) trains to convergence through the
unchanged Speech2Text stack, and its schema rejects unknown keys."""
import numpy as np
import pytest

from openseq2seq_tpu.encoders import GatedConvEncoder
from openseq2seq_tpu.models import Speech2Text
from openseq2seq_tpu.test_utils.test_speech_configs import (
    w2l_test_config)
from openseq2seq_tpu.training import trainer


def test_gatedconv_tutorial_encoder_converges(toy_speech_data):
    params, _ = w2l_test_config(toy_speech_data["csv"],
                                toy_speech_data["vocab"],
                                num_epochs=60)
    params["encoder"] = GatedConvEncoder
    params["encoder_params"] = {"num_layers": 3, "hidden_size": 160,
                                "kernel_size": 5,
                                "dropout_keep_prob": 0.9}
    model = Speech2Text(params=params, mode="train")
    result = trainer.train(model)

    eval_model = Speech2Text(params=dict(params), mode="eval")
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert np.isfinite(metrics["eval_loss"])
    assert metrics["eval_loss"] < 1.0, metrics


def test_gatedconv_schema_rejects_unknown_keys(toy_speech_data):
    params, _ = w2l_test_config(toy_speech_data["csv"],
                                toy_speech_data["vocab"])
    params["encoder"] = GatedConvEncoder
    params["encoder_params"] = {"num_layers": 2, "hidden_size": 32,
                                "not_a_real_key": 1}
    with pytest.raises(ValueError, match="not_a_real_key"):
        Speech2Text(params=params, mode="train")
