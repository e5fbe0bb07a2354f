"""Transformer-big ES->EN (reference
`example_configs/text2text/es-en/transformer-big.py` — the reverse
direction of the EN-ES recipe; set ESEN_DIR to source/target files
with Spanish as the source side)."""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("WMT16_DIR",
                      os.environ.get("ESEN_DIR", "/data/es_en"))
_base = runpy.run_path(os.path.join(_here, "transformer-big-novograd.py"))

base_model = _base["base_model"]
base_params = dict(_base["base_params"])
base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-es-en-log")
train_params = _base.get("train_params", {})
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})
