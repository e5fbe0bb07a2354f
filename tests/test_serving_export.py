"""AOT serving export: serialize the eval step with baked weights,
reload without model code, outputs must match."""
import numpy as np

import jax

from openseq2seq_tpu.models import Speech2Text
from openseq2seq_tpu.serving import export_inference_fn, load_exported
from openseq2seq_tpu.test_utils.test_speech_configs import w2l_test_config


def test_export_reload_roundtrip(toy_speech_data, tmp_path):
    base_params, _ = w2l_test_config(toy_speech_data["csv"],
                                     toy_speech_data["vocab"],
                                     num_epochs=1)
    model = Speech2Text(params=base_params, mode="eval")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)

    path = str(tmp_path / "model.stablehlo")
    blob = export_inference_fn(model, state, device_batch, path=path)
    assert len(blob) > 1000

    served = load_exported(path)
    out = served(device_batch)
    direct = model.module().apply(
        {"params": state.params, **state.model_state}, device_batch,
        train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(
        np.asarray(out["decoder_output"]["logits"]),
        np.asarray(direct["decoder_output"]["logits"]),
        rtol=1e-5, atol=1e-5)


def test_int8_weight_quantization(toy_speech_data, tmp_path):
    """INT8 weight-only export: blob shrinks, logits stay close, greedy
    transcription unchanged; calibration collects activation ranges."""
    from openseq2seq_tpu.serving import (
        calibrate_activations, dequantize_params,
        export_inference_fn_int8, load_exported_int8,
        quantize_params_int8)

    base_params, _ = w2l_test_config(toy_speech_data["csv"],
                                     toy_speech_data["vocab"],
                                     num_epochs=1)
    model = Speech2Text(params=base_params, mode="eval")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)

    qparams, report = quantize_params_int8(state.params, min_size=64)
    assert report, "nothing got quantized"
    assert all(err < 0.05 for err in report.values())
    # dequantized params reproduce close logits
    direct = model.module().apply(
        {"params": state.params, **state.model_state}, device_batch,
        train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    deq = model.module().apply(
        {"params": dequantize_params(qparams), **state.model_state},
        device_batch, train=False,
        rngs={"dropout": jax.random.PRNGKey(0)})
    l_fp = np.asarray(direct["decoder_output"]["logits"])
    l_q = np.asarray(deq["decoder_output"]["logits"])
    assert np.max(np.abs(l_fp - l_q)) < 0.15
    # untrained logits sit within quantization noise of each other, so
    # a few argmax flips are expected; require near-total agreement
    agree = np.mean(l_fp.argmax(-1) == l_q.argmax(-1))
    assert agree > 0.98, agree

    # int8 export is materially smaller than the fp32 export
    blob_fp = export_inference_fn(model, state, device_batch)
    blob_q, report2 = export_inference_fn_int8(
        model, state, device_batch, min_size=64,
        path=str(tmp_path / "model_int8.stablehlo"))
    assert report2
    assert len(blob_q) < len(blob_fp)
    served = load_exported_int8(str(tmp_path / "model_int8.stablehlo"))
    out = served(device_batch)
    l_served = np.asarray(out["decoder_output"]["logits"])
    np.testing.assert_allclose(l_served, l_q, rtol=1e-4, atol=1e-4)

    # activation calibration returns ranges for conv/dense outputs
    ranges = calibrate_activations(model, state, [device_batch])
    assert ranges and all(v >= 0 for v in ranges.values())
