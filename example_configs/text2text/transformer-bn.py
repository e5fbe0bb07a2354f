"""Transformer-base EN->DE with batch-norm pre/post-processing instead
of layer norm (reference `example_configs/text2text/en-de/
transformer-bn.py` + `parts/transformer/common.py:Transformer_BatchNorm`)."""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "transformer-base.py"))

_NORM = {
    "type": "batch_norm",
    "momentum": 0.95,
    "epsilon": 1e-5,
    "center_scale": False,
}

base_model = _base["base_model"]
base_params = dict(_base["base_params"])
base_params["encoder_params"] = dict(base_params["encoder_params"])
base_params["decoder_params"] = dict(base_params["decoder_params"])
base_params["encoder_params"]["norm_params"] = _NORM
base_params["decoder_params"]["norm_params"] = _NORM
base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-bn-log")
train_params = _base.get("train_params", {})
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})
