"""ConvS2S EN->DE (reference `example_configs/text2text/en-de/
en-de-convs2s-8-gpu.py`; SacreBLEU target 25.0, BASELINE.md)."""
import os

from openseq2seq_tpu.data.text2text import ParallelTextDataLayer
from openseq2seq_tpu.decoders import ConvS2SDecoder
from openseq2seq_tpu.encoders import ConvS2SEncoder
from openseq2seq_tpu.losses import BasicSequenceLoss
from openseq2seq_tpu.models import Text2Text

_DATA = os.environ.get("WMT16_DIR", "/data/wmt16_en_dt")
_CONV = [(512, 3)] * 9 + [(1024, 3)] * 4 + [(2048, 1)] * 2

base_model = Text2Text
base_params = {
    "random_seed": 0,
    "prng_impl": "rbg",  # TPU-hardware dropout keys (docs/internals.md)
    "dropout_bits": 8,   # u8 threshold masks (parts/dropout.py)
    "num_epochs": 30,
    "logdir": os.environ.get("OS2S_LOGDIR", "convs2s-log"),
    "batch_size_per_gpu": 64,
    "print_loss_steps": 100,
    "save_summaries_steps": 100,
    "eval_steps": 4000,
    "save_checkpoint_steps": 4000,
    "num_checkpoints": 5,
    "optimizer": "Momentum",
    "optimizer_params": {"learning_rate": 0.5, "momentum": 0.99},
    "lr_policy": "exp_decay",
    "lr_policy_params": {"decay_steps": 4000, "decay_rate": 0.9,
                         "use_staircase_decay": True,
                         "begin_decay_at": 170000, "min_lr": 1e-4},
    "max_grad_norm": 0.1,
    "dtype": "mixed",
    "encoder": ConvS2SEncoder,
    "encoder_params": {
        "src_emb_size": 512,
        "src_vocab_size": 32768,
        "pad_embeddings_2_eight": True,
        "conv_nchannels_kwidth": _CONV,
        "embedding_dropout_keep_prob": 0.8,
        "hidden_dropout_keep_prob": 0.8,
        "max_input_length": 1024,
    },
    "decoder": ConvS2SDecoder,
    "decoder_params": {
        "tgt_emb_size": 512,
        "tgt_vocab_size": 32768,
        "out_emb_size": 512,
        "shared_embed": True,
        "conv_nchannels_kwidth": _CONV,
        "embedding_dropout_keep_prob": 0.8,
        "hidden_dropout_keep_prob": 0.8,
        "out_dropout_keep_prob": 0.8,
        "beam_size": 5,
        "alpha": 0.6,
        "extra_decode_length": 50,
        "EOS_ID": 1,
        "GO_SYMBOL": 2,
        "batch_size": 64,
        "max_input_length": 1024,
    },
    "loss": BasicSequenceLoss,
    "loss_params": {"offset_target_by_one": True,
                    "average_across_timestep": True},
    "data_layer": ParallelTextDataLayer,
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "train.tok.clean.bpe.32000.en"),
        "target_file": os.path.join(_DATA, "train.tok.clean.bpe.32000.de"),
        "src_vocab_file": os.path.join(_DATA, "vocab.bpe.32000"),
        "tgt_vocab_file": os.path.join(_DATA, "vocab.bpe.32000"),
        "max_length": 64,
        "shuffle": True,
        "repeat": True,
        "pad_lengths_to_eight": True,
    },
}
eval_params = {
    "data_layer_params": {
        "source_file": os.path.join(_DATA, "newstest2013.tok.bpe.32000.en"),
        "target_file": os.path.join(_DATA, "newstest2013.tok.bpe.32000.de"),
        "shuffle": False, "repeat": False,
    },
}
