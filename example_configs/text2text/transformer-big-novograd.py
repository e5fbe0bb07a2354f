"""Transformer-big EN->DE with NovoGrad (reference
`example_configs/text2text/en-de/transformer-big.py` + the NovoGrad
recipe; SacreBLEU target 28.0, BASELINE.md)."""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "transformer-base.py"))

base_model = _base["base_model"]
base_params = _base["base_params"]
eval_params = _base.get("eval_params", {})
infer_params = _base.get("infer_params", {})

d_model = 1024
base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-big-log")
base_params["encoder_params"].update({
    "hidden_size": d_model, "num_heads": 16, "filter_size": 4 * d_model,
})
base_params["decoder_params"].update({
    "hidden_size": d_model, "num_heads": 16, "filter_size": 4 * d_model,
})
base_params["optimizer"] = "NovoGrad"
base_params["optimizer_params"] = {
    "beta1": 0.95, "beta2": 0.98, "epsilon": 1e-8,
    "weight_decay": 0.0001,
}
base_params["lr_policy"] = "poly_decay"
base_params["lr_policy_params"] = {
    "learning_rate": 0.04, "power": 2.0, "decay_steps": 300000,
    "warmup_steps": 4000, "min_lr": 1e-5,
}
