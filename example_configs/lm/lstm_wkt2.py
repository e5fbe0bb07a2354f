"""LSTM language model on WikiText-2 (reference
`example_configs/lm/lstm-wkt2-fp32.py`). Perplexity target: 89.9
(BASELINE.md)."""
import os

from openseq2seq_tpu.data.lm import WKTDataLayer
from openseq2seq_tpu.decoders import FakeDecoder
from openseq2seq_tpu.encoders import LMEncoder
from openseq2seq_tpu.losses import BasicSequenceLoss
from openseq2seq_tpu.models import LSTMLM

_DATA = os.environ.get("WIKITEXT2_DIR", "/data/wikitext-2")

base_model = LSTMLM
base_params = {
    "random_seed": 0,
    # fused Pallas LSTM scan (ops/lstm_pallas.py; measured +25%
    # tokens/s at wkt103 shapes — bench_results/chip_queue22.log)
    "fused_rnn": True,
    "num_epochs": 100,
    "logdir": os.environ.get("OS2S_LOGDIR", "lm_wkt2_log"),
    "batch_size_per_gpu": 32,
    "print_loss_steps": 50,
    "save_summaries_steps": 100,
    "eval_steps": 1000,
    "save_checkpoint_steps": 2000,
    "num_checkpoints": 3,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 1e-3},
    "lr_policy": "exp_decay",
    "lr_policy_params": {"decay_steps": 10000, "decay_rate": 0.9,
                         "use_staircase_decay": True,
                         "begin_decay_at": 20000, "min_lr": 1e-5},
    "max_grad_norm": 0.25,
    "dtype": "mixed",

    "encoder": LMEncoder,
    "encoder_params": {
        "emb_size": 650,
        "encoder_layers": 2,
        "encoder_use_skip_connections": False,
        "core_cell": None,
        "core_cell_params": {"num_units": 650},
        "use_cudnn_rnn": True,
        "cudnn_rnn_type": "cudnn_lstm",
        "weight_tied": True,
        "encoder_emb_keep_prob": 0.9,
        "encoder_dp_input_keep_prob": 0.7,
        "encoder_dp_output_keep_prob": 0.7,
        "encoder_last_output_keep_prob": 0.6,
    },
    "decoder": FakeDecoder,
    "decoder_params": {},
    "loss": BasicSequenceLoss,
    "loss_params": {},
    "data_layer": WKTDataLayer,
    "data_layer_params": {
        "data_root": _DATA,
        "processed_data_folder": os.path.join(_DATA, "processed"),
        "repeat": True,
        "bptt": 96,
        "rand_start": True,
    },
}
eval_params = {"data_layer_params": {"shuffle": False}}
