"""GNMT-like EN->DE with tied embedding / softmax weights (reference
`example_configs/text2text/en-de/en-de-gnmt-like-weight-tied-2GPUs.py`):
small 200-unit cells, 80-dim embeddings, skip connections, and
``weight_tied: True`` in the decoder (the output projection reuses the
target embedding table — `decoders/rnn_decoders.py`)."""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "en-de-gnmt-like.py"))

base_model = _base["base_model"]
base_params = dict(_base["base_params"])
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})

base_params["logdir"] = os.environ.get("OS2S_LOGDIR", "gnmt-wt-log")
base_params["dtype"] = "float32"
base_params["encoder_params"] = dict(base_params["encoder_params"])
base_params["encoder_params"].update({
    "src_emb_size": 80,
    "core_cell_params": {"num_units": 200},
    "encoder_use_skip_connections": True,
})
base_params["decoder_params"] = dict(base_params["decoder_params"])
base_params["decoder_params"].update({
    "tgt_emb_size": 80,
    "core_cell_params": {"num_units": 200},
    "decoder_use_skip_connections": True,
    "weight_tied": True,
})
