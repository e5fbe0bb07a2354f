"""DeepSpeech2 on LibriSpeech (reference
`example_configs/speech2text/ds2_large_8gpus.py`). Greedy-WER target:
6.71 dev-clean (BASELINE.md)."""
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
    # fused Pallas RNN scans (ops/lstm_pallas.py, ops/gru_pallas.py):
    # DS2-medium measured 174.1 -> 223.3 utt/s/chip (MFU 0.218 ->
    # 0.300, bench_results/chip_queue23.log); exact same math as the
    # lax.scan path (cells whose shapes the VMEM gate rejects fall
    # back transparently)
    "fused_rnn": True,
    "num_epochs": 50,
    "logdir": os.environ.get("OS2S_LOGDIR", "ds2_log_folder"),
    "batch_size_per_gpu": 16,
    "print_loss_steps": 10,
    "save_summaries_steps": 100,
    "eval_steps": 5000,
    "save_checkpoint_steps": 1000,
    "num_checkpoints": 5,

    "optimizer": "Momentum",
    "optimizer_params": {"learning_rate": 0.001, "momentum": 0.9},
    "lr_policy": "poly_decay",
    "lr_policy_params": {"power": 0.5, "decay_steps": 200000},
    "larc_params": {"larc_eta": 0.001},
    "dtype": "mixed",
    "regularizer": "l2",
    "regularizer_params": {"scale": 0.0005},

    "encoder": DeepSpeech2Encoder,
    "encoder_params": {
        "conv_layers": [
            {"kernel_size": [11, 41], "stride": [2, 2],
             "num_channels": 32, "padding": "SAME"},
            {"kernel_size": [11, 21], "stride": [1, 2],
             "num_channels": 32, "padding": "SAME"},
        ],
        "num_rnn_layers": 5,
        "rnn_cell_dim": 800,
        "use_cudnn_rnn": True,
        "rnn_type": "cudnn_gru",
        "rnn_unidirectional": False,
        "row_conv": False,
        "n_hidden": 1600,
        "dropout_keep_prob": 0.5,
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
        "num_audio_features": 160,
        "input_type": "spectrogram",
        "vocab_file": os.path.join(_DATA, "vocab.txt"),
        "dataset_files": [
            os.path.join(_DATA, "librivox-train-clean-100.csv"),
            os.path.join(_DATA, "librivox-train-clean-360.csv"),
            os.path.join(_DATA, "librivox-train-other-500.csv"),
        ],
        "max_duration": 16.7,
        "sample_freq": 16000,
    },
}
eval_params = {
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-dev-clean.csv")],
        "shuffle": False,
    },
}
infer_params = {
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA,
                                       "librivox-test-clean.csv")],
        "shuffle": False,
    },
}
