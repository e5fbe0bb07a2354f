"""Joint CTC-Attention on LibriSpeech (reference
`example_configs/speech2text/jca_large_8gpus.py`): LAS conv listener +
joint CTC/attention heads trained with MultiTaskCTCEntropyLoss
(lambda=0.25); inference decodes the attention head with beam 4."""
import os

import jax
import jax.numpy as jnp

from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
from openseq2seq_tpu.decoders import (FullyConnectedCTCDecoder,
                                      JointCTCAttentionDecoder,
                                      ListenAttendSpellDecoder)
from openseq2seq_tpu.encoders import ListenAttendSpellEncoder
from openseq2seq_tpu.losses import MultiTaskCTCEntropyLoss
from openseq2seq_tpu.models import Speech2Text

_DATA = os.environ.get("LIBRISPEECH_DIR", "/data/librispeech")


def _clipped_relu(x):
    return jnp.minimum(jax.nn.relu(x), 20.0)


base_model = Speech2Text
base_params = {
    "random_seed": 0,
    "prng_impl": "rbg",  # TPU-hardware dropout keys (docs/internals.md)
    "dropout_bits": 8,   # u8 threshold masks (parts/dropout.py)
    "num_epochs": 50,
    "logdir": os.environ.get("OS2S_LOGDIR", "jca_log_folder"),
    "batch_size_per_gpu": 64,
    "save_summaries_steps": 1100,
    "print_loss_steps": 10,
    "print_samples_steps": 200,
    "eval_steps": 1100,
    "save_checkpoint_steps": 1100,

    "optimizer": "Adam",
    "optimizer_params": {},
    "lr_policy": "poly_decay",
    "lr_policy_params": {"learning_rate": 1e-3, "power": 2.0,
                         "min_lr": 1e-5, "decay_steps": 500000},
    "max_grad_norm": 1.0,
    "regularizer": "l2",
    "regularizer_params": {"scale": 1e-4},
    "dtype": "float32",

    "encoder": ListenAttendSpellEncoder,
    "encoder_params": {
        "convnet_layers": [
            {"type": "conv1d", "repeat": 1, "kernel_size": [11],
             "stride": [2], "num_channels": 256, "padding": "SAME",
             "dropout_keep_prob": 0.8},
            {"type": "conv1d", "repeat": 7, "kernel_size": [11],
             "stride": [1], "num_channels": 256, "padding": "SAME",
             "dropout_keep_prob": 0.8},
            {"type": "conv1d", "repeat": 1, "kernel_size": [11],
             "stride": [2], "num_channels": 384, "padding": "SAME",
             "dropout_keep_prob": 0.8},
            {"type": "conv1d", "repeat": 3, "kernel_size": [11],
             "stride": [1], "num_channels": 512, "padding": "SAME",
             "dropout_keep_prob": 0.8},
            {"type": "conv1d", "repeat": 4, "kernel_size": [11],
             "stride": [1], "num_channels": 768, "padding": "SAME",
             "dropout_keep_prob": 0.7},
        ],
        "recurrent_layers": [],
        "dropout_keep_prob": 0.8,
        "normalization": "batch_norm",
        "activation_fn": _clipped_relu,
    },

    "decoder": JointCTCAttentionDecoder,
    "decoder_params": {
        "attn_decoder": ListenAttendSpellDecoder,
        "attn_decoder_params": {
            "tgt_emb_size": 256,
            "pos_embedding": True,
            "attention_params": {
                "attention_dim": 256,
                "attention_type": "chorowski",
                "use_coverage": True,
                "num_heads": 1,
                "plot_attention": True,
            },
            "rnn_type": "lstm",
            "hidden_dim": 512,
            "num_layers": 1,
            "dropout_keep_prob": 0.8,
        },
        "ctc_decoder": FullyConnectedCTCDecoder,
        "ctc_decoder_params": {"use_language_model": False},
        "beam_search_params": {"beam_width": 4},
        "language_model_params": {"use_language_model": False},
        "GO_SYMBOL": 29,
        "END_SYMBOL": 30,
        "tgt_vocab_size": 31,
    },

    "loss": MultiTaskCTCEntropyLoss,
    "loss_params": {
        "seq_loss_params": {"offset_target_by_one": False,
                            "average_across_timestep": True,
                            "do_mask": True},
        "ctc_loss_params": {},
        "lambda_value": 0.25,
    },

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
        "autoregressive": True,
    },
}
eval_params = {
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-dev-clean.csv")],
        "shuffle": False,
    },
}
