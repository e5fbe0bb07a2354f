"""GNMT-like EN->DE (reference `example_configs/text2text/en-de/
en-de-gnmt-like-4GPUs.py`). SacreBLEU target: 23.0 (BASELINE.md)."""
import os

from openseq2seq_tpu.data.text2text import ParallelTextDataLayer
from openseq2seq_tpu.decoders import BeamSearchRNNDecoderWithAttention
from openseq2seq_tpu.encoders import GNMTLikeEncoderWithEmbedding
from openseq2seq_tpu.losses import BasicSequenceLoss
from openseq2seq_tpu.models import Text2Text

_DATA = os.environ.get("WMT16_DIR", "/data/wmt16_en_dt")

base_model = Text2Text
base_params = {
    "random_seed": 0,
    # fused Pallas RNN scans (ops/lstm_pallas.py, ops/gru_pallas.py):
    # DS2-medium measured 174.1 -> 223.3 utt/s/chip (MFU 0.218 ->
    # 0.300, bench_results/chip_queue23.log); exact same math as the
    # lax.scan path (cells whose shapes the VMEM gate rejects fall
    # back transparently)
    "fused_rnn": True,
    "prng_impl": "rbg",  # TPU-hardware dropout keys (docs/internals.md)
    "dropout_bits": 8,   # u8 threshold masks (parts/dropout.py)
    "num_epochs": 8,
    "logdir": os.environ.get("OS2S_LOGDIR", "gnmt-log"),
    "batch_size_per_gpu": 32,
    "print_loss_steps": 50,
    "save_summaries_steps": 100,
    "eval_steps": 4000,
    "save_checkpoint_steps": 4000,
    "num_checkpoints": 5,
    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 8e-4},
    "lr_policy": "exp_decay",
    "lr_policy_params": {"begin_decay_at": 170000, "decay_steps": 17000,
                         "decay_rate": 0.5, "use_staircase_decay": True,
                         "min_lr": 1e-6},
    "max_grad_norm": 32768.0,
    "dtype": "mixed",
    "encoder": GNMTLikeEncoderWithEmbedding,
    "encoder_params": {
        "src_vocab_size": 32768,
        "src_emb_size": 1024,
        "core_cell": "lstm",
        "core_cell_params": {"num_units": 1024},
        "encoder_layers": 7,
        "encoder_use_skip_connections": False,
        "encoder_dp_input_keep_prob": 0.8,
    },
    "decoder": BeamSearchRNNDecoderWithAttention,
    "decoder_params": {
        "GO_SYMBOL": 2,
        "END_SYMBOL": 1,
        "tgt_vocab_size": 32768,
        "tgt_emb_size": 1024,
        "attention_layer_size": 1024,
        "attention_type": "gnmt_v2",
        "core_cell": "lstm",
        "core_cell_params": {"num_units": 1024},
        "decoder_layers": 8,
        "decoder_use_skip_connections": False,
        "decoder_dp_input_keep_prob": 0.8,
        "batch_size": 32,
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
