"""Transformer-big EN->DE with NovoGrad — faithful to the reference
(`example_configs/text2text/en-de/transformer-nvgrad.py`): d_model 1024
/ 16 heads, attention dropout 0.1 but relu/postprocess dropout 0.3,
layernorm_L2 norm (momentum 0.95, eps 1e-5), NovoGrad(0.95, 0.99,
wd 1e-5, no grad averaging) + poly_decay lr 0.04 power 2 over 600k
steps, batch 128. SacreBLEU target 28.0 (BASELINE.md)."""
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
norm_params = {
    "type": "layernorm_L2",
    "momentum": 0.95,
    "epsilon": 1e-5,
}

base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-big-log")
base_params["batch_size_per_gpu"] = 128
base_params.pop("num_epochs", None)
base_params["max_steps"] = 600000
base_params["eval_steps"] = 10000
base_params["save_checkpoint_steps"] = 99999
base_params["encoder_params"].update({
    "hidden_size": d_model, "num_heads": 16, "filter_size": 4 * d_model,
    "relu_dropout": dropout, "layer_postprocess_dropout": dropout,
    "norm_params": norm_params,
})
base_params["decoder_params"].update({
    "hidden_size": d_model, "num_heads": 16, "filter_size": 4 * d_model,
    "relu_dropout": dropout, "layer_postprocess_dropout": dropout,
    "norm_params": norm_params,
})
base_params["optimizer"] = "NovoGrad"
base_params["optimizer_params"] = {
    "beta1": 0.95, "beta2": 0.99, "epsilon": 1e-8,
    "weight_decay": 1e-5, "grad_averaging": False,
}
base_params["lr_policy"] = "poly_decay"
base_params["lr_policy_params"] = {
    "learning_rate": 0.04, "power": 2.0, "decay_steps": 600000,
    "min_lr": 0.0,
}

train_params = _base.get("train_params", {})
