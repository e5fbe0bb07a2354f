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


def test_int8_activation_execution(tmp_path):
    """INT8-activation serving (TF-TRT INT8-engine equivalent): Dense
    layers with calibrated input ranges execute as int8 x int8 -> int32
    matmuls; outputs must stay close to fp and the exported artifact
    must reproduce the live int8 path."""
    import tempfile

    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.serving import (calibrate_dense_inputs,
                                         export_inference_fn_int8,
                                         int8_apply_fn,
                                         load_exported_int8)
    from openseq2seq_tpu.test_utils import toy_nmt

    data = toy_nmt.generate(tempfile.mkdtemp())
    cfg = toy_nmt.transformer_toy_config(data, num_epochs=1)
    model = Text2Text(params=cfg, mode="train")  # logits-only module
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)

    ranges = calibrate_dense_inputs(model, state, [device_batch])
    assert ranges, "no Dense layers were calibrated"

    fp_out = model.module().apply(
        {"params": state.params, **state.model_state}, device_batch,
        train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    q_out = int8_apply_fn(model, state, ranges)(device_batch)

    fp_logits = np.asarray(fp_out["decoder_output"]["logits"],
                           np.float32)
    q_logits = np.asarray(q_out["decoder_output"]["logits"], np.float32)
    assert fp_logits.shape == q_logits.shape
    # int8 path must actually change the numerics (it ran) ...
    assert not np.allclose(fp_logits, q_logits, atol=1e-6)
    # ... but stay faithful: bounded error relative to the logit scale
    scale = np.std(fp_logits)
    assert np.max(np.abs(q_logits - fp_logits)) < 0.35 * scale
    agree = np.mean(np.argmax(q_logits, -1) == np.argmax(fp_logits, -1))
    assert agree > 0.97

    # exported artifact runs the same int8 program
    path = str(tmp_path / "model_int8act.npz")
    blob, report = export_inference_fn_int8(
        model, state, device_batch, path=path, min_size=64,
        act_ranges=ranges)
    served = load_exported_int8(path)
    exported_out = served(device_batch)
    # the artifact additionally quantizes embeddings (weight-only), so
    # compare fidelity against the fp reference, same bound as live int8
    e_logits = np.asarray(exported_out["decoder_output"]["logits"],
                          np.float32)
    assert np.max(np.abs(e_logits - fp_logits)) < 0.35 * scale
    agree_e = np.mean(np.argmax(e_logits, -1) == np.argmax(fp_logits, -1))
    assert agree_e > 0.97


def test_export_with_on_device_beam(toy_speech_data, tmp_path):
    """The AOT artifact can bake the WHOLE decode: on-device prefix
    beam search serializes inside the StableHLO export and the reloaded
    artifact reproduces ids/lengths/scores with no model code."""
    base_params, _ = w2l_test_config(toy_speech_data["csv"],
                                     toy_speech_data["vocab"],
                                     num_epochs=1)
    base_params["decoder_params"] = dict(
        base_params.get("decoder_params", {}),
        on_device_beam_width=4)
    model = Speech2Text(params=base_params, mode="eval")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)

    path = str(tmp_path / "beam.stablehlo")
    export_inference_fn(model, state, device_batch, path=path)
    served = load_exported(path)
    out = served(device_batch)
    direct = model.module().apply(
        {"params": state.params, **state.model_state}, device_batch,
        train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    ids_s, lens_s = out["decoder_output"]["outputs"][:2]
    ids_d, lens_d = direct["decoder_output"]["outputs"][:2]
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_d))
    np.testing.assert_array_equal(np.asarray(lens_s),
                                  np.asarray(lens_d))
    np.testing.assert_allclose(
        np.asarray(out["decoder_output"]["beam_scores"]),
        np.asarray(direct["decoder_output"]["beam_scores"]),
        rtol=1e-5, atol=1e-5)
