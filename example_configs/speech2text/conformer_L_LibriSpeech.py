"""Conformer-CTC (L-scale) on LibriSpeech — beyond-parity ASR recipe.

The published large geometry (Gulati et al. 2020 table 1: 17 layers,
d_model 512, 8 heads, ~118M params; paper WER 2.1/4.3 test-clean/other
with LM at the Transducer head — this recipe keeps the CTC head so it
rides the identical Speech2Text stack: same data layer, fused Pallas
CTC, greedy/beam+LM decode ladder, streaming apps).

Unlike the M scale (VPU/norm-bound at d=256 on TPU), the L scale's
d=512 matmuls tile the MXU properly — see scripts/bench_conformer.py
BENCH_SCALE=l for the measured throughput/MFU.

Point LIBRISPEECH_DIR at CSVs built by scripts/import_librispeech.py.
"""
import os

from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder
from openseq2seq_tpu.encoders import ConformerEncoder
from openseq2seq_tpu.losses import CTCLoss
from openseq2seq_tpu.models import Speech2Text

_DATA = os.environ.get("LIBRISPEECH_DIR", "/data/librispeech")

base_model = Speech2Text

base_params = {
    "random_seed": 0,
    "use_horovod": False,
    "num_epochs": 100,
    "logdir": os.environ.get("OS2S_LOGDIR", "conformer_l_log_folder"),
    # measured ladder (v5e, synthetic T=1000, scripts/bench_conformer
    # BENCH_SCALE=l): bs32 105.1 utt/s / bs64 218.7 / bs128 294.9 (MFU
    # 0.293, post rel-shift) / bs256 OOM. Real LibriSpeech batches pad
    # to ~1670 frames (max_duration 16.7 s), so bs64 here carries the
    # bench's ~bs107 token budget — the saturated point with headroom.
    "batch_size_per_gpu": 64,
    "save_summaries_steps": 100,
    "print_loss_steps": 10,
    "print_samples_steps": 2200,
    "eval_steps": 2200,
    "save_checkpoint_steps": 1100,
    "num_checkpoints": 2,

    # transformer (noam) schedule, as in the paper: warmup then 1/sqrt(t)
    "optimizer": "AdamW",
    "optimizer_params": {
        "learning_rate": 2.0, "beta1": 0.9, "beta2": 0.98,
        "epsilon": 1e-9, "weight_decay": 1e-6,
    },
    "lr_policy": "transformer_policy",
    "lr_policy_params": {"learning_rate": 2.0, "d_model": 512,
                         "warmup_steps": 10000},
    "dtype": "mixed",
    "max_grad_norm": 5.0,
    # measured TPU perf defaults (docs/internals.md "Shipped
    # performance defaults")
    "prng_impl": "rbg",
    "dropout_bits": 8,
    "remat": "blocks",

    "encoder": ConformerEncoder,
    "encoder_params": {
        "num_layers": 17,
        "hidden_size": 512,
        "num_heads": 8,
        "conv_kernel_size": 31,
        "ffn_expansion": 4,
        "dropout_keep_prob": 0.9,
        "attention_dropout_keep_prob": 0.9,
    },
    "decoder": FullyConnectedCTCDecoder,
    "decoder_params": {"use_language_model": False},
    "loss": CTCLoss,
    "loss_params": {"use_pallas": True},

    "data_layer": Speech2TextDataLayer,
    "data_layer_params": {
        "num_audio_features": 80,
        "input_type": "logfbank",
        "vocab_file": os.path.join(_DATA, "vocab.txt"),
        "dataset_files": [
            os.path.join(_DATA, "librivox-train-clean-100.csv"),
            os.path.join(_DATA, "librivox-train-clean-360.csv"),
            os.path.join(_DATA, "librivox-train-other-500.csv"),
        ],
        "norm_per_feature": True,
        "window": "hanning",
        "precompute_mel_basis": True,
        "sample_freq": 16000,
        "pad_to": 16,
        "dither": 1e-5,
        "max_duration": 16.7,
        "cache_features": True,
        "augmentation": {
            "n_freq_mask": 2, "n_time_mask": 10,
            "width_freq_mask": 27, "width_time_mask": 5,
        },
    },
}

train_params = {"data_layer_params": {"shuffle": True}}

eval_params = {
    "batch_size_per_gpu": 64,
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-dev-clean.csv")],
        "shuffle": False,
        "augmentation": {},
    },
}

infer_params = {
    "batch_size_per_gpu": 64,
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-test-clean.csv")],
        "shuffle": False,
        "augmentation": {},
    },
}
