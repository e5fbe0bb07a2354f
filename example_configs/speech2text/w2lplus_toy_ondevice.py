"""Toy W2L+ trained from RAW-AUDIO batches: the data layer ships padded
wav samples and the log-mel front end runs inside the jitted step on
the accelerator (`featurize_on_device`, ops/features_jax.py — the
BASELINE north star's on-device featurization).

Run:
  python run.py \
      --config_file=example_configs/speech2text/w2lplus_toy_ondevice.py \
      --mode=train_eval
"""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "w2lplus_toy.py"))

base_model = _base["base_model"]
base_params = dict(_base["base_params"])
base_params["data_layer_params"] = dict(base_params["data_layer_params"])
base_params["data_layer_params"]["featurize_on_device"] = True
base_params["logdir"] = os.environ.get("OS2S_TOY_LOGDIR",
                                       "/tmp/os2s_toy_ondevice_logs")
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})
