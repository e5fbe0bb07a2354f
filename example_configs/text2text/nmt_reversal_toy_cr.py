"""Toy NMT on the synthetic reversal task, ConvS2S encoder + RNN
attention decoder — the mixed "CR" wiring of the reference
(`example_configs/text2text/toy-reversal/nmt-reversal-CR.py`),
demonstrating that encoders and decoders compose freely across
families.

Run:
  python run.py \
      --config_file=example_configs/text2text/nmt_reversal_toy_cr.py \
      --mode=train_eval
"""
import os

from openseq2seq_tpu.test_utils import toy_nmt

_DATA_DIR = os.environ.get("OS2S_TOY_NMT_DIR", "/tmp/os2s_toy_nmt")
if not os.path.exists(os.path.join(_DATA_DIR, "train.src")):
    toy_nmt.generate(_DATA_DIR)
_DATA = {"train_src": os.path.join(_DATA_DIR, "train.src"),
         "train_tgt": os.path.join(_DATA_DIR, "train.tgt"),
         "eval_src": os.path.join(_DATA_DIR, "eval.src"),
         "eval_tgt": os.path.join(_DATA_DIR, "eval.tgt"),
         "vocab": os.path.join(_DATA_DIR, "vocab.txt")}

from openseq2seq_tpu.data.text2text import ParallelTextDataLayer  # noqa
from openseq2seq_tpu.decoders import (  # noqa: E402
    BeamSearchRNNDecoderWithAttention)
from openseq2seq_tpu.encoders import ConvS2SEncoder  # noqa: E402
from openseq2seq_tpu.losses import BasicSequenceLoss  # noqa: E402
from openseq2seq_tpu.models import Text2Text  # noqa: E402

_VOCAB = 16

base_model = Text2Text
base_params = {
    "random_seed": 0,
    "num_epochs": 120,
    "logdir": os.environ.get("OS2S_TOY_NMT_LOGDIR",
                             "/tmp/os2s_toy_nmt_cr_logs"),
    "batch_size_per_gpu": 32,
    "print_loss_steps": 100,
    "eval_steps": 400,
    "save_checkpoint_steps": 400,
    "num_checkpoints": 2,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 1e-3},
    "max_grad_norm": 3.0,
    "dtype": "float32",

    "encoder": ConvS2SEncoder,
    "encoder_params": {
        "src_emb_size": 48,
        "src_vocab_size": _VOCAB,
        "pad_embeddings_2_eight": False,
        "conv_nchannels_kwidth": [[48, 3]] * 2,
        "embedding_dropout_keep_prob": 0.9,
        "hidden_dropout_keep_prob": 0.9,
        "max_input_length": 64,
    },
    "decoder": BeamSearchRNNDecoderWithAttention,
    "decoder_params": {
        "GO_SYMBOL": 2,
        "END_SYMBOL": 1,
        "tgt_vocab_size": _VOCAB,
        "tgt_emb_size": 48,
        "attention_layer_size": 48,
        "attention_type": "bahdanau",
        "core_cell": "lstm",
        "core_cell_params": {"num_units": 48},
        "decoder_layers": 1,
        "decoder_use_skip_connections": False,
        "batch_size": 32,
        "beam_width": 4,
        "length_penalty": 1.0,
    },
    "loss": BasicSequenceLoss,
    "loss_params": {"offset_target_by_one": True,
                    "average_across_timestep": True, "do_mask": True},
    "data_layer": ParallelTextDataLayer,
    "data_layer_params": {
        "source_file": _DATA["train_src"],
        "target_file": _DATA["train_tgt"],
        "src_vocab_file": _DATA["vocab"],
        "tgt_vocab_file": _DATA["vocab"],
        "max_length": 16,
        "shuffle": True,
        "repeat": True,
        "special_tokens_already_in_vocab": False,
        "pad_lengths_to_eight": False,
    },
}
eval_params = {
    "data_layer_params": {
        "source_file": _DATA["eval_src"],
        "target_file": _DATA["eval_tgt"],
        "shuffle": False,
    },
}
infer_params = {
    "data_layer_params": {
        "source_file": _DATA["eval_src"],
        "target_file": _DATA["eval_tgt"],
        "shuffle": False,
        "use_targets": False,
    },
}
