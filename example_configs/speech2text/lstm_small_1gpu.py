"""Conv + BiLSTM CTC model on LibriSpeech clean-100 (reference
`example_configs/speech2text/lstm_small_1gpu.py`)."""
import os

import jax

from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder
from openseq2seq_tpu.encoders import DeepSpeech2Encoder
from openseq2seq_tpu.losses import CTCLoss
from openseq2seq_tpu.models import Speech2Text

_DATA = os.environ.get("LIBRISPEECH_DIR", "/data/librispeech")

base_model = Speech2Text
base_params = {
    "random_seed": 0,
    "prng_impl": "rbg",  # TPU-hardware dropout keys (docs/internals.md)
    "dropout_bits": 8,   # u8 threshold masks (parts/dropout.py)
    "num_epochs": 50,
    "logdir": os.environ.get("OS2S_LOGDIR", "lstm_log_folder"),
    "batch_size_per_gpu": 32,
    "print_loss_steps": 10,
    "save_summaries_steps": 100,
    "eval_steps": 500,
    "save_checkpoint_steps": 500,

    "optimizer": "Momentum",
    "optimizer_params": {"learning_rate": 0.001, "momentum": 0.9},
    "lr_policy": "poly_decay",
    "lr_policy_params": {"power": 2.0, "decay_steps": 100000},
    "larc_params": {"larc_eta": 0.001},
    "dtype": "mixed",

    "encoder": DeepSpeech2Encoder,
    "encoder_params": {
        "conv_layers": [
            {"kernel_size": [11, 41], "stride": [2, 2],
             "num_channels": 32, "padding": "SAME"},
        ],
        "num_rnn_layers": 4,
        "rnn_cell_dim": 512,
        "use_cudnn_rnn": True,
        "rnn_type": "cudnn_lstm",
        "rnn_unidirectional": False,
        "row_conv": False,
        "n_hidden": 512,
        "dropout_keep_prob": 0.8,
        "activation_fn": jax.nn.relu,
    },
    "decoder": FullyConnectedCTCDecoder,
    "decoder_params": {"use_language_model": False},
    "loss": CTCLoss,
    "loss_params": {},
    "data_layer": Speech2TextDataLayer,
    "data_layer_params": {
        "num_audio_features": 64,
        "input_type": "logfbank",
        "vocab_file": os.path.join(_DATA, "vocab.txt"),
        "dataset_files": [
            os.path.join(_DATA, "librivox-train-clean-100.csv"),
        ],
        "max_duration": 16.7,
    },
}
eval_params = {
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-dev-clean.csv")],
        "shuffle": False,
    },
}
