"""Conformer-CTC (M-scale) on LibriSpeech — beyond-parity ASR recipe.

No reference counterpart (OpenSeq2Seq predates the Conformer,
`open_seq2seq/encoders/` stops at TDNN/DS2/LAS); included because it is
the architecture that superseded Jasper/QuartzNet on LibriSpeech and it
rides the identical Speech2Text stack: same data layer, CTC loss
(fused Pallas kernels), greedy/beam+LM decode ladder, streaming apps.

Paper reference WERs (Gulati et al. 2020, Conformer-M ~30M params):
2.3/5.0 test-clean/other with LM — well past the reference framework's
Jasper 3.61 dev-clean greedy headline.

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
    "logdir": os.environ.get("OS2S_LOGDIR", "conformer_log_folder"),
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
    "lr_policy_params": {"learning_rate": 2.0, "d_model": 256,
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
        "num_layers": 16,
        "hidden_size": 256,
        "num_heads": 4,
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
    # fully on-device beam decode (no host round trip) — opt in with:
    # "decoder_params": {"on_device_beam_width": 16,
    #                    "on_device_fusion": {"lm_path": "char.arpa",
    #                                         "alpha": 0.5}},
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-test-clean.csv")],
        "shuffle": False,
        "augmentation": {},
    },
}
