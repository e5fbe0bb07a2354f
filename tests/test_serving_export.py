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
