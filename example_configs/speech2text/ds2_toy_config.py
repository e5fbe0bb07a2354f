"""Toy DeepSpeech2 config on the synthetic speech set (reference
`example_configs/speech2text/ds2_toy_config.py` /
`test_utils/test_speech_configs/ds2_test_config.py` role): conv2d +
BiGRU + CTC, CPU-trainable in minutes.

Run:
  python run.py --config_file=example_configs/speech2text/ds2_toy_config.py \
      --mode=train_eval
"""
import os

import jax

from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder
from openseq2seq_tpu.encoders import DeepSpeech2Encoder
from openseq2seq_tpu.losses import CTCLoss
from openseq2seq_tpu.models import Speech2Text
from openseq2seq_tpu.test_utils import toy_speech

_DATA_DIR = os.environ.get("OS2S_TOY_DATA_DIR", "/tmp/os2s_toy_speech")
if not os.path.exists(os.path.join(_DATA_DIR, "toy_data.csv")):
    toy_speech.generate(_DATA_DIR)
_CSV = os.path.join(_DATA_DIR, "toy_data.csv")
_VOCAB = os.path.join(_DATA_DIR, "vocab.txt")

base_model = Speech2Text
base_params = {
    "random_seed": 0,
    # fused Pallas RNN scans (ops/lstm_pallas.py, ops/gru_pallas.py):
    # DS2-medium measured 174.1 -> 223.3 utt/s/chip (MFU 0.218 ->
    # 0.300, bench_results/chip_queue23.log); exact same math as the
    # lax.scan path (cells whose shapes the VMEM gate rejects fall
    # back transparently)
    "fused_rnn": True,
    "num_epochs": 200,
    "logdir": os.environ.get("OS2S_TOY_LOGDIR", "/tmp/os2s_ds2_toy_logs"),
    "batch_size_per_gpu": 10,
    "print_loss_steps": 25,
    "eval_steps": 100,
    "save_checkpoint_steps": 100,
    "num_checkpoints": 2,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 5e-4},
    "lr_policy": "poly_decay",
    "lr_policy_params": {"power": 0.5, "decay_steps": 10000},
    "dtype": "float32",
    "max_grad_norm": 5.0,

    "encoder": DeepSpeech2Encoder,
    "encoder_params": {
        "conv_layers": [
            {"kernel_size": [5, 11], "stride": [2, 2],
             "num_channels": 16, "padding": "SAME"},
        ],
        "num_rnn_layers": 1,
        "rnn_cell_dim": 64,
        "use_cudnn_rnn": True,
        "rnn_type": "cudnn_gru",
        "rnn_unidirectional": False,
        "row_conv": False,
        "n_hidden": 64,
        "dropout_keep_prob": 1.0,
        "activation_fn": jax.nn.relu,
    },
    "decoder": FullyConnectedCTCDecoder,
    "decoder_params": {"use_language_model": False},
    "loss": CTCLoss,
    "loss_params": {},
    "data_layer": Speech2TextDataLayer,
    "data_layer_params": {
        "num_audio_features": 40,
        "input_type": "logfbank",
        "vocab_file": _VOCAB,
        "dataset_files": [_CSV],
        "shuffle": True,
    },
}
eval_params = {
    "data_layer_params": {"dataset_files": [_CSV], "shuffle": False},
}
infer_params = {
    "data_layer_params": {"dataset_files": [_CSV], "shuffle": False},
}
