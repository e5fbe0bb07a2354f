"""Tacotron-2 on LJSpeech in full fp32 (reference
`example_configs/text2speech/tacotron_float.py`; the bf16 recipe lives
in `tacotron_LJ.py`)."""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "tacotron_LJ.py"))

base_model = _base["base_model"]
base_params = dict(_base["base_params"])
base_params["dtype"] = "float32"
base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "tacotron_float_log_folder")
train_params = _base.get("train_params", {})
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})
