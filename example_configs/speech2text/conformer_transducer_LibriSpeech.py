"""Conformer-Transducer (RNN-T, M-scale) on LibriSpeech — beyond-parity
streaming-ASR recipe.

No reference counterpart (OpenSeq2Seq stops at CTC/attention ASR); the
Conformer-Transducer is the production streaming architecture of
record. The encoder recipe matches `conformer_LibriSpeech.py`; the
decoder is an LSTM prediction network + additive joint network
(`decoders/transducer_decoder.py`) trained with the wavefront RNN-T
loss (`ops/transducer.py`) and decoded frame-synchronously (greedy) on
device.

Paper reference WERs (Gulati et al. 2020, Conformer-M transducer):
2.0/4.3 test-clean/other with LM fusion.

Point LIBRISPEECH_DIR at CSVs built by scripts/import_librispeech.py.
"""
import os

from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
from openseq2seq_tpu.decoders import TransducerDecoder
from openseq2seq_tpu.encoders import ConformerEncoder
from openseq2seq_tpu.losses import TransducerLoss
from openseq2seq_tpu.models import Speech2Text

_DATA = os.environ.get("LIBRISPEECH_DIR", "/data/librispeech")

base_model = Speech2Text

base_params = {
    "random_seed": 0,
    "use_horovod": False,
    "num_epochs": 100,
    "logdir": os.environ.get("OS2S_LOGDIR", "conformer_rnnt_log_folder"),
    # with the diagonal-fused loss (decoder_params.fused_loss below) the
    # (B, T/4, U+1, V) joint lattice is never materialized, so batch is
    # bounded by encoder activations, not the RNN-T memory wall.
    # bs128 is the measured throughput optimum on v5e (216.1 utt/s/chip
    # vs 162.8 at bs64, 209.7 at bs256 — scripts/bench_transducer.py)
    "batch_size_per_gpu": 128,
    "save_summaries_steps": 100,
    "print_loss_steps": 10,
    "print_samples_steps": 2200,
    "eval_steps": 2200,
    "save_checkpoint_steps": 1100,
    "num_checkpoints": 2,

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
    "decoder": TransducerDecoder,
    "decoder_params": {
        "pred_embed_size": 320,
        "pred_units": 320,
        "pred_layers": 1,
        "joint_dim": 320,
        "dropout_keep_prob": 0.9,
        "max_symbols_per_frame": 3,
        # evaluate the joint inside the loss wavefront scan — no
        # (B, T, U+1, V) lattice in HBM (ops/transducer.py)
        "fused_loss": True,
    },
    "loss": TransducerLoss,
    "loss_params": {
        # FastEmit (arXiv:2010.11148): emission-gradient scale
        # pushing labels to emit earlier — the latency lever for
        # streaming serving. 0.0 disables (offline-optimal).
        "fastemit_lambda": 0.004,
    },

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
    "batch_size_per_gpu": 32,
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-dev-clean.csv")],
        "shuffle": False,
        "augmentation": {},
    },
}

infer_params = {
    "batch_size_per_gpu": 32,
    # beam decode with on-device n-gram shallow fusion (uncomment and
    # point lm_fusion_arpa at a char LM built by
    # ops/ngram_fusion.py:build_label_lm — see docs/speech-recognition.md):
    # "decoder_params": {
    #     "beam_width": 8,
    #     "lm_fusion_arpa": os.path.join(_DATA, "char_lm.arpa"),
    #     "lm_fusion_weight": 0.3,
    #     "lm_fusion_beta": 0.1,
    #     "alphabet_config_path": os.path.join(_DATA, "vocab.txt"),
    # },
    "data_layer_params": {
        "dataset_files": [os.path.join(_DATA, "librivox-test-clean.csv")],
        "shuffle": False,
        "augmentation": {},
    },
}
