"""Tacotron-2 + Global Style Tokens on a multi-speaker corpus
(reference `example_configs/text2speech/tacotron_gst.py`)."""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "tacotron_LJ.py"))

base_model = _base["base_model"]
base_params = _base["base_params"]
train_params = _base.get("train_params", {})
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})

base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "tacotron_gst_log_folder")
base_params["encoder_params"]["style_embedding_enable"] = True
base_params["encoder_params"]["style_embedding_params"] = {
    "num_tokens": 10,
    "num_units": 256,
    "attention_heads": 4,
    "conv_layers": [32, 32, 64, 64, 128, 128],
    "num_rnn_units": 128,
}
