"""Toy Conformer-Transducer (RNN-T) config on the synthetic speech set —
CPU-trainable smoke/convergence config for the transducer decoder + loss
(beyond-parity: the reference stops at CTC/attention ASR; see
`decoders/transducer_decoder.py`, `ops/transducer.py`).

Run:
  python run.py \
      --config_file=example_configs/speech2text/conformer_transducer_toy.py \
      --mode=train_eval
"""
import os

from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
from openseq2seq_tpu.decoders import TransducerDecoder
from openseq2seq_tpu.encoders import ConformerEncoder
from openseq2seq_tpu.losses import TransducerLoss
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
    "num_epochs": 200,
    "logdir": os.environ.get("OS2S_TOY_LOGDIR",
                             "/tmp/os2s_conformer_rnnt_toy_logs"),
    "batch_size_per_gpu": 10,
    "save_summaries_steps": None,
    "print_loss_steps": 20,
    "print_samples_steps": None,
    "eval_steps": 100,
    "save_checkpoint_steps": 200,
    "num_checkpoints": 2,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 1e-3},
    "lr_policy": "poly_decay",
    "lr_policy_params": {"power": 0.5, "decay_steps": 10000},
    "dtype": "float32",
    "max_grad_norm": 5.0,

    "encoder": ConformerEncoder,
    "encoder_params": {
        "num_layers": 2,
        "hidden_size": 64,
        "num_heads": 4,
        "conv_kernel_size": 15,
        "ffn_expansion": 2,
        "dropout_keep_prob": 1.0,
    },
    "decoder": TransducerDecoder,
    "decoder_params": {
        "pred_embed_size": 64,
        "pred_units": 64,
        "pred_layers": 1,
        "joint_dim": 64,
        "beam_width": 1,   # CLI-overridable: --decoder_params/beam_width 8
        "fused_loss": False,  # --decoder_params/fused_loss True
    },
    "loss": TransducerLoss,
    "loss_params": {
        # FastEmit (arXiv:2010.11148): emission-gradient scale
        # pushing labels to emit earlier — the latency lever for
        # streaming serving. 0.0 disables (offline-optimal).
        "fastemit_lambda": 0.0,
    },

    "data_layer": Speech2TextDataLayer,
    "data_layer_params": {
        "num_audio_features": 40,
        "input_type": "logfbank",
        "vocab_file": _VOCAB,
        "dataset_files": [_CSV],
        "shuffle": True,
        "pad_to": 16,
        "norm_per_feature": True,
        "window": "hanning",
        "precompute_mel_basis": True,
        "sample_freq": 16000,
    },
}

train_params = {}

eval_params = {
    "batch_size_per_gpu": 10,
    "data_layer_params": {"shuffle": False},
}

infer_params = {
    "batch_size_per_gpu": 10,
    "data_layer_params": {"shuffle": False},
}
