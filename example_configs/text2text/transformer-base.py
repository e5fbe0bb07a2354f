"""Transformer-base EN->DE WMT (reference
`example_configs/text2text/en-de/transformer-base.py`). SacreBLEU
target: 26.4 (BASELINE.md). Expects BPE-tokenized parallel corpora and
a shared subword vocab (see openseq2seq_tpu.data.text2text.tokenizer).
"""
import os

from openseq2seq_tpu.data.text2text import ParallelTextDataLayer
from openseq2seq_tpu.decoders import TransformerDecoder
from openseq2seq_tpu.encoders import TransformerEncoder
from openseq2seq_tpu.losses import PaddedCrossEntropyLossWithSmoothing
from openseq2seq_tpu.models import Text2Text

_DATA = os.environ.get("WMT16_DIR", "/data/wmt16_en_dt")
d_model = 512
num_layers = 6

base_model = Text2Text
base_params = {
    "random_seed": 0,
    "prng_impl": "rbg",  # TPU-hardware dropout keys (docs/internals.md)
    "dropout_bits": 8,   # u8 threshold masks (parts/dropout.py)
    "num_epochs": 30,
    "logdir": os.environ.get("OS2S_LOGDIR", "transformer-base-log"),
    "batch_size_per_gpu": 128,
    "print_loss_steps": 100,
    "save_summaries_steps": 100,
    "eval_steps": 4000,
    "save_checkpoint_steps": 2000,
    "num_checkpoints": 5,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 2.0, "beta1": 0.9,
                         "beta2": 0.997, "epsilon": 1e-9},
    "lr_policy": "transformer_policy",
    "lr_policy_params": {"learning_rate": 2.0, "warmup_steps": 8000,
                         "d_model": d_model},
    "dtype": "mixed",

    "encoder": TransformerEncoder,
    "encoder_params": {
        "encoder_layers": num_layers,
        "hidden_size": d_model,
        "num_heads": 8,
        "attention_dropout": 0.1,
        "filter_size": 4 * d_model,
        "relu_dropout": 0.1,
        "layer_postprocess_dropout": 0.1,
        "remove_padding": True,
        "pad_embeddings_2_eight": True,
    },
    "decoder": TransformerDecoder,
    "decoder_params": {
        "EOS_ID": 1,
        "GO_SYMBOL": 2,
        "layer_postprocess_dropout": 0.1,
        "num_hidden_layers": num_layers,
        "hidden_size": d_model,
        "num_heads": 8,
        "attention_dropout": 0.1,
        "relu_dropout": 0.1,
        "filter_size": 4 * d_model,
        "beam_size": 4,
        "alpha": 0.6,
        "extra_decode_length": 50,
        # prefix-bounded segmented beam decode: early steps read a
        # time-sliced KV cache instead of the full (·, T, ·) buffer.
        # Exact (identical beams); measured 24.8 -> 39.1 sent/s/chip
        # on v5e at beam 4 (scripts/bench_nmt_decode.py).
        "decode_segments": 3,
    },
    "loss": PaddedCrossEntropyLossWithSmoothing,
    "loss_params": {"label_smoothing": 0.1},
    "data_layer": ParallelTextDataLayer,
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "train.clean.en.shuffled.BPE_common.32K.tok"),
        "target_file": os.path.join(_DATA, "train.clean.de.shuffled.BPE_common.32K.tok"),
        "src_vocab_file": os.path.join(_DATA, "m_common.vocab"),
        "tgt_vocab_file": os.path.join(_DATA, "m_common.vocab"),
        "max_length": 56,
        "shuffle": True,
        "repeat": True,
        "pad_lengths_to_eight": True,
        "pad_vocab_to_eight": True,
    },
}

eval_params = {
    "batch_size_per_gpu": 16,
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "wmt13-en-de.src.BPE_common.32K.tok"),
        "target_file": os.path.join(_DATA, "wmt13-en-de.ref.BPE_common.32K.tok"),
        "shuffle": False,
        "repeat": False,
        "max_length": 256,
    },
}
infer_params = {
    "batch_size_per_gpu": 16,
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "wmt14-en-de.src.BPE_common.32K.tok"),
        "target_file": os.path.join(_DATA, "wmt14-en-de.src.BPE_common.32K.tok"),
        "use_targets": False,
        "shuffle": False,
        "repeat": False,
        "max_length": 256,
    },
}
