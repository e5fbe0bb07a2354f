"""Transformer-big fed by T2T wordpiece TFRecords — the reference's
`TransformerDataLayer` path (`open_seq2seq/data/text2text/text2text.py:299-388`
+ `t2t.py` + the Tensor2Tensor `Subtokenizer`): records hold subtoken
ids produced by the wordpiece vocab, batched by token budget. Same
model/optimizer stack as `transformer-big.py`; only the data layer
differs. Point ``WMT16_DIR`` at a directory with a ``t2t/`` subdir
(``vocab.ende.sub`` + ``train-*.tfrecord`` + ``dev-*.tfrecord``) —
reference-preprocessed T2T shards load id-exactly
(`tests/test_wordpiece.py`), and `scripts/make_synth_wmt.py` builds a
synthetic one.
"""
import os
import runpy

from openseq2seq_tpu.data.text2text import TransformerDataLayer

_here = os.path.dirname(os.path.abspath(__file__))
_base = runpy.run_path(os.path.join(_here, "transformer-big.py"))

base_model = _base["base_model"]
base_params = _base["base_params"]

_T2T = os.path.join(os.environ.get("WMT16_DIR", "/data/wmt16_en_dt"),
                    "t2t")
_vocab = os.path.join(_T2T, "vocab.ende.sub")


def _vocab_size(path):
    with open(path, encoding="utf-8") as f:
        return sum(1 for _ in f)


base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-big-t2t-log")
base_params["data_layer"] = TransformerDataLayer
base_params["data_layer_params"] = {
    "data_dir": _T2T,
    "file_pattern": "train-*.tfrecord",
    "src_vocab_size": _vocab_size(_vocab) if os.path.exists(_vocab)
    else 32768,
    # batch_size is injected by the model from batch_size_per_gpu
    "max_length": 64,
    "pad_lengths_to_eight": True,
    "pad_vocab_to_eight": True,
    "vocab_file": _vocab,
    "shuffle": True,
    "repeat": True,
}

train_params = _base.get("train_params", {})
eval_params = {
    "batch_size_per_gpu": 16,
    "data_layer_params": {
        "file_pattern": "dev-*.tfrecord",
        "shuffle": False,
        "repeat": False,
    },
}
infer_params = {
    "batch_size_per_gpu": 16,
    "data_layer_params": {
        "file_pattern": "dev-*.tfrecord",
        "shuffle": False,
        "repeat": False,
    },
}
