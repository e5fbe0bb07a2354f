"""LSTM language model on WikiText-103 with sampled softmax over the
~268k vocab (reference `example_configs/lm/lstm-wkt103-mixed.py`).
Perplexity target: 48.6 (BASELINE.md)."""
import os

from openseq2seq_tpu.data.lm import WKTDataLayer
from openseq2seq_tpu.decoders import FakeDecoder
from openseq2seq_tpu.encoders import LMEncoder
from openseq2seq_tpu.losses import BasicSampledSequenceLoss
from openseq2seq_tpu.models import LSTMLM

_DATA = os.environ.get("WIKITEXT103_DIR", "/data/wikitext-103")

base_model = LSTMLM
base_params = {
    "random_seed": 0,
    # fused Pallas LSTM scan (ops/lstm_pallas.py): measured 264.2k ->
    # 331.1k tokens/s/chip (MFU 0.148 -> 0.226) at these shapes
    # (bench_results/chip_queue22.log); exact same math as the scan
    "fused_rnn": True,
    "num_epochs": 25,
    "logdir": os.environ.get("OS2S_LOGDIR", "lm_wkt103_log"),
    "batch_size_per_gpu": 224,
    "print_loss_steps": 50,
    "save_summaries_steps": 200,
    "eval_steps": 8000,
    "save_checkpoint_steps": 5000,
    "num_checkpoints": 2,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 1e-3},
    "lr_policy": "exp_decay",
    "lr_policy_params": {"decay_steps": 40000, "decay_rate": 0.9,
                         "use_staircase_decay": True,
                         "begin_decay_at": 100000, "min_lr": 1e-6},
    "max_grad_norm": 0.25,
    "dtype": "mixed",

    "encoder": LMEncoder,
    "encoder_params": {
        "emb_size": 320,
        "encoder_layers": 3,
        "encoder_use_skip_connections": False,
        "core_cell": None,
        "core_cell_params": {"num_units": 1024},
        "use_cudnn_rnn": True,
        "cudnn_rnn_type": "cudnn_lstm",
        "weight_tied": False,
        "num_sampled": 8192,    # sampled-softmax candidates
        "encoder_emb_keep_prob": 0.9,
        "encoder_dp_input_keep_prob": 0.8,
        "encoder_dp_output_keep_prob": 0.8,
        "encoder_last_output_keep_prob": 0.8,
    },
    "decoder": FakeDecoder,
    "decoder_params": {},
    "loss": BasicSampledSequenceLoss,
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
