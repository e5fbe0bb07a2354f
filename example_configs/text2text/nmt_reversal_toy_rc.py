"""Toy NMT on the synthetic reversal task, bidirectional-RNN encoder +
ConvS2S decoder — the mixed "RC" wiring of the reference
(`example_configs/text2text/toy-reversal/nmt-reversal-RC.py`).

Run:
  python run.py \
      --config_file=example_configs/text2text/nmt_reversal_toy_rc.py \
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
from openseq2seq_tpu.decoders import ConvS2SDecoder  # noqa: E402
from openseq2seq_tpu.encoders import (  # noqa: E402
    BidirectionalRNNEncoderWithEmbedding)
from openseq2seq_tpu.losses import BasicSequenceLoss  # noqa: E402
from openseq2seq_tpu.models import Text2Text  # noqa: E402

_VOCAB = 16

base_model = Text2Text
base_params = {
    "random_seed": 0,
    "num_epochs": 120,
    "logdir": os.environ.get("OS2S_TOY_NMT_LOGDIR",
                             "/tmp/os2s_toy_nmt_rc_logs"),
    "batch_size_per_gpu": 32,
    "print_loss_steps": 100,
    "eval_steps": 400,
    "save_checkpoint_steps": 400,
    "num_checkpoints": 2,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 1e-3},
    "max_grad_norm": 0.5,
    "dtype": "float32",

    "encoder": BidirectionalRNNEncoderWithEmbedding,
    "encoder_params": {
        "src_vocab_size": _VOCAB,
        "src_emb_size": 48,
        "core_cell": "lstm",
        "core_cell_params": {"num_units": 24},  # 2x24 bidi = 48 out
        "encoder_layers": 1,
        "encoder_use_skip_connections": False,
    },
    "decoder": ConvS2SDecoder,
    "decoder_params": {
        "tgt_emb_size": 48,
        "tgt_vocab_size": _VOCAB,
        "out_emb_size": 48,
        "shared_embed": False,
        "conv_nchannels_kwidth": [[48, 3]] * 2,
        "embedding_dropout_keep_prob": 0.9,
        "hidden_dropout_keep_prob": 0.9,
        "out_dropout_keep_prob": 0.9,
        "beam_size": 4,
        "alpha": 0.6,
        "extra_decode_length": 4,
        "EOS_ID": 1,
        "GO_SYMBOL": 2,
        "batch_size": 32,
        "max_input_length": 64,
    },
    "loss": BasicSequenceLoss,
    "loss_params": {"offset_target_by_one": True,
                    "average_across_timestep": True},
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
