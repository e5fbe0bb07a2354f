"""Transformer-big EN->ES (reference
`example_configs/text2text/en-es/transformer-big.py` — identical
architecture to the EN-DE recipe, paraphrase-corpus data paths)."""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("WMT16_DIR",
                      os.environ.get("ENES_DIR", "/data/en_es"))
_base = runpy.run_path(os.path.join(_here, "transformer-big-novograd.py"))

base_model = _base["base_model"]
base_params = dict(_base["base_params"])
base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-en-es-log")
train_params = _base.get("train_params", {})
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})
