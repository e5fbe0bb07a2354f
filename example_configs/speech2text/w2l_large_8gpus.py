"""Wave2Letter (original, non-plus) on LibriSpeech (reference
`example_configs/speech2text/w2l_large_8gpus.py`). Plain conv1d stack,
batch norm, SGD-with-momentum + LARC."""
import os

import jax

from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder
from openseq2seq_tpu.encoders import TDNNEncoder
from openseq2seq_tpu.losses import CTCLoss
from openseq2seq_tpu.models import Speech2Text

_DATA = os.environ.get("LIBRISPEECH_DIR", "/data/librispeech")


def _block(repeat, kernel, ch, keep):
    return {"type": "conv1d", "repeat": repeat, "kernel_size": [kernel],
            "stride": [1], "num_channels": ch, "padding": "SAME",
            "dilation": [1], "dropout_keep_prob": keep}


base_model = Speech2Text
base_params = {
    "random_seed": 0,
    "num_epochs": 200,
    "logdir": os.environ.get("OS2S_LOGDIR", "w2l_log_folder"),
    "batch_size_per_gpu": 32,
    "print_loss_steps": 10,
    "save_summaries_steps": 100,
    "eval_steps": 5000,
    "save_checkpoint_steps": 1000,

    "optimizer": "Momentum",
    "optimizer_params": {"learning_rate": 0.05, "momentum": 0.9},
    "lr_policy": "poly_decay",
    "lr_policy_params": {"power": 2.0, "decay_steps": 400000},
    "larc_params": {"larc_eta": 0.001},
    "dtype": "mixed",
    "regularizer": "l2",
    "regularizer_params": {"scale": 0.001},

    "encoder": TDNNEncoder,
    "encoder_params": {
        "convnet_layers": [
            _block(1, 11, 256, 0.8),
            _block(3, 11, 256, 0.8),
            _block(3, 13, 384, 0.8),
            _block(3, 17, 512, 0.8),
            _block(3, 21, 640, 0.7),
            _block(3, 25, 768, 0.7),
            _block(1, 29, 896, 0.6),
            _block(1, 1, 1024, 0.6),
        ],
        "dropout_keep_prob": 0.7,
        "normalization": "batch_norm",
        "activation_fn": jax.nn.relu,
    },
    "decoder": FullyConnectedCTCDecoder,
    "decoder_params": {"use_language_model": False},
    "loss": CTCLoss,
    "loss_params": {"use_pallas": True},
    "prng_impl": "rbg",
    "dropout_bits": 8,   # u8 threshold masks (parts/dropout.py)
    "data_layer": Speech2TextDataLayer,
    "data_layer_params": {
        "num_audio_features": 64,
        "input_type": "logfbank",
        "vocab_file": os.path.join(_DATA, "vocab.txt"),
        "dataset_files": [
            os.path.join(_DATA, "librivox-train-clean-100.csv"),
            os.path.join(_DATA, "librivox-train-clean-360.csv"),
            os.path.join(_DATA, "librivox-train-other-500.csv"),
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
