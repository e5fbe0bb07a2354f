"""SST-2 sentiment transfer from a small WikiText-2 pretrained LM
(reference `example_configs/transfer/sst-wkt2-small.py`): half-width
encoder for quick experiments; pair with a matching small LM run
(`lm/lstm_test_small.py` widened to 512 units) for ``load_model``.
"""
import os

from openseq2seq_tpu.data.lm import SSTDataLayer
from openseq2seq_tpu.decoders import FakeDecoder
from openseq2seq_tpu.encoders import LMEncoder
from openseq2seq_tpu.losses import CrossEntropyLoss
from openseq2seq_tpu.models import LSTMLM

_DATA = os.environ.get("SST_DIR", "/data/SST-2")
_LM_DIR = os.environ.get("WKT2_LM_LOGDIR", "lm_wkt2_small_log")
_LM_VOCAB = os.environ.get(
    "WKT2_VOCAB", os.path.join(os.environ.get("WIKITEXT2_DIR",
                                              "/data/wikitext-2"),
                               "processed", "vocab.txt"))

base_model = LSTMLM
base_params = {
    "random_seed": 0,
    "num_epochs": 60,
    "logdir": os.environ.get("OS2S_LOGDIR", "sst_wkt2_small_log"),
    "load_model": _LM_DIR,
    "restore_best_checkpoint": True,
    "lm_vocab_file": _LM_VOCAB,
    "batch_size_per_gpu": 20,
    "print_loss_steps": 10,
    "save_summaries_steps": 10,
    "eval_steps": 20,
    "save_checkpoint_steps": 10,

    "optimizer": "Adam",
    "optimizer_params": {},
    "lr_policy": "fixed",
    "lr_policy_params": {"learning_rate": 1e-5},
    "regularizer": "l2",
    "regularizer_params": {"scale": 1e-4},
    "dtype": "float32",

    "encoder": LMEncoder,
    "encoder_params": {
        "emb_size": 128,
        "encoder_layers": 2,
        "encoder_use_skip_connections": False,
        "core_cell": None,
        "core_cell_params": {"num_units": 512},
        "use_cudnn_rnn": False,
        "cudnn_rnn_type": None,
        "weight_tied": True,
        "fc_use_bias": True,
        "use_cell_state": True,
    },
    "decoder": FakeDecoder,
    "decoder_params": {},
    "loss": CrossEntropyLoss,
    "loss_params": {},
    "data_layer": SSTDataLayer,
    "data_layer_params": {
        "data_root": _DATA,
        "lm_vocab_file": _LM_VOCAB,
        "processed_data_folder": os.path.join(_DATA, "processed"),
        "max_length": 96,
        "repeat": True,
        "num_classes": 2,
    },
}
eval_params = {"data_layer_params": {"shuffle": False}}
