"""Transformer-big EN->DE WMT — faithful to the reference headline
recipe (`example_configs/text2text/en-de/transformer-big.py`):
d_model 1024 / 16 heads / filter 4096, attention dropout 0.1 but relu
and layer-postprocess dropout 0.3, Adam(0.9, 0.997, 1e-9) +
transformer_policy lr 2.0 / warmup 8000, batch 256 sentence pairs,
300k steps. SacreBLEU target: 28.0 (BASELINE.md,
docs/machine-translation.rst:20-35).

The reference uses tf.contrib's LazyAdamOptimizer — "lazy" only changes
how TF applies updates to rows of tf.IndexedSlices (sparse embedding
gradients); under XLA the embedding gradient is dense, so plain Adam is
the exact equivalent here.
"""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "transformer-base.py"))

base_model = _base["base_model"]
base_params = _base["base_params"]
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})

d_model = 1024
dropout = 0.3

base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-big-log")
base_params["batch_size_per_gpu"] = 256
base_params.pop("num_epochs", None)
base_params["max_steps"] = 300000
base_params["encoder_params"].update({
    "hidden_size": d_model, "num_heads": 16, "filter_size": 4 * d_model,
    "relu_dropout": dropout, "layer_postprocess_dropout": dropout,
})
base_params["decoder_params"].update({
    "hidden_size": d_model, "num_heads": 16, "filter_size": 4 * d_model,
    "relu_dropout": dropout, "layer_postprocess_dropout": dropout,
})
base_params["lr_policy_params"]["d_model"] = d_model

train_params = _base.get("train_params", {})
