"""IMDB sentiment transfer from a WikiText-103 pretrained LM (reference
`example_configs/transfer/imdb-wkt103.py`): restore the bigger WKT-103
LM encoder via ``load_model``, swap the head to binary classification.
"""
import os

from openseq2seq_tpu.data.lm import IMDBDataLayer
from openseq2seq_tpu.decoders import FakeDecoder
from openseq2seq_tpu.encoders import LMEncoder
from openseq2seq_tpu.losses import CrossEntropyLoss
from openseq2seq_tpu.models import LSTMLM

_DATA = os.environ.get("IMDB_DIR", "/data/aclImdb")
_LM_DIR = os.environ.get("WKT103_LM_LOGDIR", "lm_wkt103_log")
_LM_VOCAB = os.environ.get(
    "WKT103_VOCAB", os.path.join(os.environ.get("WIKITEXT103_DIR",
                                                "/data/wikitext-103"),
                                 "processed", "vocab.txt"))

base_model = LSTMLM
base_params = {
    "random_seed": 0,
    "num_epochs": 25,
    "logdir": os.environ.get("OS2S_LOGDIR", "imdb_wkt103_log"),
    "load_model": _LM_DIR,
    "restore_best_checkpoint": True,
    "lm_vocab_file": _LM_VOCAB,
    "batch_size_per_gpu": 16,
    "print_loss_steps": 10,
    "save_summaries_steps": 10,
    "eval_steps": 20,
    "save_checkpoint_steps": 10,

    "optimizer": "Adam",
    "optimizer_params": {},
    "lr_policy": "fixed",
    "lr_policy_params": {"learning_rate": 1e-5},
    "regularizer": "l2",
    "regularizer_params": {"scale": 2e-4},
    "dtype": "float32",

    # must match the WKT-103 LM recipe (lm/lstm_wkt103.py) for
    # load_model name+shape partial restore to pick everything up
    "encoder": LMEncoder,
    "encoder_params": {
        "emb_size": 320,
        "encoder_layers": 3,
        "encoder_use_skip_connections": False,
        "core_cell": None,
        "core_cell_params": {"num_units": 1024},
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
    "data_layer": IMDBDataLayer,
    "data_layer_params": {
        "data_root": _DATA,
        "lm_vocab_file": _LM_VOCAB,
        "processed_data_folder": os.path.join(_DATA, "processed_wkt103"),
        "binary": True,
        "max_length": 256,
        "repeat": True,
        "num_classes": 2,
    },
}
eval_params = {"data_layer_params": {"shuffle": False}}
