"""Toy Transformer NMT config on the synthetic reversal task (analogue
of the reference's toy NMT configs used by `scripts/run_all_tests.sh`).

Run:
  python run.py --config_file=example_configs/text2text/nmt_reversal_toy.py \
      --mode=train_eval
"""
import os

from openseq2seq_tpu.test_utils import toy_nmt

_DATA_DIR = os.environ.get("OS2S_TOY_NMT_DIR", "/tmp/os2s_toy_nmt")
if not os.path.exists(os.path.join(_DATA_DIR, "train.src")):
    toy_nmt.generate(_DATA_DIR)
_DATA = {"train_src": os.path.join(_DATA_DIR, "train.src"),
         "train_tgt": os.path.join(_DATA_DIR, "train.tgt"),
         "eval_src": os.path.join(_DATA_DIR, "eval.src"),
         "eval_tgt": os.path.join(_DATA_DIR, "eval.tgt"),
         "vocab": os.path.join(_DATA_DIR, "vocab.txt")}

from openseq2seq_tpu.models import Text2Text  # noqa: E402

base_model = Text2Text
base_params = toy_nmt.transformer_toy_config(_DATA, "train", num_epochs=100)
base_params["logdir"] = os.environ.get("OS2S_TOY_NMT_LOGDIR",
                                       "/tmp/os2s_toy_nmt_logs")
base_params["save_checkpoint_steps"] = 400
base_params["print_loss_steps"] = 100

eval_params = {
    "data_layer_params": {
        "source_file": _DATA["eval_src"],
        "target_file": _DATA["eval_tgt"],
        "shuffle": False,
    },
}
infer_params = {
    "data_layer_params": {
        "source_file": _DATA["eval_src"],
        "target_file": _DATA["eval_tgt"],
        "shuffle": False,
        "use_targets": False,
    },
}
