"""Transformer-XL language model on WikiText-103 — the rescorer LM the
reference trains externally in PyTorch (`external_lm_rescore/`,
`transformerxl/mem_transformer.py`; steps in its README) to rescore
dumped ASR beams. Here it is a framework-native recipe: train with this
config, then hand the checkpoint to
`openseq2seq_tpu.apps.lm_rescorer.NeuralRescorer` (or
`scripts/decode.py`'s rescoring path) — same flow as the LSTM LM.

Model shape follows the reference rescorer's base WT103 setting
(16 layers, d_model 410, 10 heads, d_inner 2100). Training and the
rescorer score whole sequences mem-less (static shapes, one program);
segment-streaming scoring with memory is available at the module level
(`TransformerXLNet.__call__(..., mems=, mems_valid=)`).
"""
import os

from openseq2seq_tpu.data.lm import WKTDataLayer
from openseq2seq_tpu.decoders import FakeDecoder
from openseq2seq_tpu.encoders import TransformerXLEncoder
from openseq2seq_tpu.losses import BasicSequenceLoss
from openseq2seq_tpu.models import LSTMLM

_DATA = os.environ.get("WIKITEXT103_DIR", "/data/wikitext-103")

base_model = LSTMLM
base_params = {
    "random_seed": 0,
    "num_epochs": 25,
    "logdir": os.environ.get("OS2S_LOGDIR", "txl_wkt103_log"),
    "batch_size_per_gpu": 64,
    "print_loss_steps": 50,
    "save_summaries_steps": 200,
    "eval_steps": 8000,
    "save_checkpoint_steps": 5000,
    "num_checkpoints": 2,

    "optimizer": "Adam",
    "optimizer_params": {"learning_rate": 2.5e-4},
    "lr_policy": "cosine_decay",
    # cosine_decay's min_lr is a FRACTION of the base lr (tf alpha
    # semantics, `optimizers/lr_policies.py`): 0.004 * 2.5e-4 = 1e-6
    "lr_policy_params": {"learning_rate": 2.5e-4, "warmup_steps": 4000,
                         "decay_steps": 200000, "min_lr": 0.004},
    "max_grad_norm": 0.25,
    "dtype": "mixed",

    "encoder": TransformerXLEncoder,
    "encoder_params": {
        "num_layers": 16,
        "hidden_size": 410,
        "num_heads": 10,
        "filter_size": 2100,
        "dropout": 0.1,
        "attention_dropout": 0.0,
        "mem_len": 0,       # train mem-less (one segment per step);
                            # segment scoring passes mems functionally
    },
    "decoder": FakeDecoder,
    "decoder_params": {},
    "loss": BasicSequenceLoss,
    "loss_params": {"average_across_timestep": True, "do_mask": False},
    "data_layer": WKTDataLayer,
    "data_layer_params": {
        "data_root": _DATA,
        "processed_data_folder": os.path.join(_DATA, "processed"),
        "bptt": 192,
        "repeat": True,
    },
}
eval_params = {
    "data_layer_params": {"repeat": False},
}
