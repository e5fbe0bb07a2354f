"""Small bidirectional-LSTM NMT EN->DE (reference
`example_configs/text2text/en-de/en-de-nmt-small.py`) — the minutes-to-
first-BLEU recipe of the NMT track."""
import os

from openseq2seq_tpu.data.text2text import ParallelTextDataLayer
from openseq2seq_tpu.decoders import BeamSearchRNNDecoderWithAttention
from openseq2seq_tpu.encoders import BidirectionalRNNEncoderWithEmbedding
from openseq2seq_tpu.losses import BasicSequenceLoss
from openseq2seq_tpu.models import Text2Text

_DATA = os.environ.get("WMT16_DIR", "/data/wmt16_en_dt")

base_model = Text2Text
base_params = {
    "random_seed": 0,
    "prng_impl": "rbg",  # TPU-hardware dropout keys (docs/internals.md)
    "dropout_bits": 8,   # u8 threshold masks (parts/dropout.py)
    "max_steps": 160082,
    "logdir": os.environ.get("OS2S_LOGDIR", "nmt-small-log"),
    "batch_size_per_gpu": 64,
    "print_loss_steps": 50,
    "save_summaries_steps": 50,
    "eval_steps": 4000,
    "save_checkpoint_steps": 4000,
    "num_checkpoints": 5,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 1e-3},
    "max_grad_norm": 3.0,
    "dtype": "float32",

    "encoder": BidirectionalRNNEncoderWithEmbedding,
    "encoder_params": {
        "src_vocab_size": 32768,
        "src_emb_size": 512,
        "core_cell": "lstm",
        "core_cell_params": {"num_units": 512},
        "encoder_layers": 2,
        "encoder_use_skip_connections": False,
        "encoder_dp_input_keep_prob": 0.8,
    },
    "decoder": BeamSearchRNNDecoderWithAttention,
    "decoder_params": {
        "GO_SYMBOL": 2,
        "END_SYMBOL": 1,
        "tgt_vocab_size": 32768,
        "tgt_emb_size": 512,
        "attention_layer_size": 512,
        "attention_type": "gnmt_v2",
        "core_cell": "lstm",
        "core_cell_params": {"num_units": 512},
        "decoder_layers": 2,
        "decoder_use_skip_connections": False,
        "decoder_dp_input_keep_prob": 0.8,
        "batch_size": 64,
        "beam_width": 10,
        "length_penalty": 1.0,
    },
    "loss": BasicSequenceLoss,
    "loss_params": {"offset_target_by_one": True,
                    "average_across_timestep": True, "do_mask": True},
    "data_layer": ParallelTextDataLayer,
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "train.tok.clean.bpe.32000.en"),
        "target_file": os.path.join(_DATA, "train.tok.clean.bpe.32000.de"),
        "src_vocab_file": os.path.join(_DATA, "vocab.bpe.32000"),
        "tgt_vocab_file": os.path.join(_DATA, "vocab.bpe.32000"),
        "max_length": 50,
        "shuffle": True,
        "repeat": True,
    },
}
eval_params = {
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "newstest2013.tok.bpe.32000.en"),
        "target_file": os.path.join(_DATA, "newstest2013.tok.bpe.32000.de"),
        "shuffle": False, "repeat": False, "max_length": 32,
    },
}
infer_params = {
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "newstest2014.tok.bpe.32000.en"),
        "target_file": os.path.join(_DATA, "newstest2014.tok.bpe.32000.en"),
        "use_targets": False, "shuffle": False, "repeat": False,
        "max_length": 256,
    },
}
