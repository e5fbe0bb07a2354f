"""TFRecord/tf.Example parsing without TensorFlow + TransformerDataLayer."""
import numpy as np
import pytest

from openseq2seq_tpu.data.text2text import TransformerDataLayer
from openseq2seq_tpu.data.text2text.t2t import (parse_example,
                                                read_tfrecords,
                                                write_tfrecords)


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "train-00000-of-00001")
    examples = [
        {"inputs": [5, 6, 7, 1], "targets": [8, 9, 1]},
        {"inputs": [10, 1], "targets": [11, 12, 13, 1]},
    ]
    write_tfrecords(path, examples)
    parsed = [parse_example(r) for r in read_tfrecords(path)]
    assert len(parsed) == 2
    assert parsed[0]["inputs"] == [5, 6, 7, 1]
    assert parsed[1]["targets"] == [11, 12, 13, 1]


def test_transformer_data_layer(tmp_path):
    path = str(tmp_path / "wmt-train-00000-of-00001")
    rng = np.random.RandomState(0)
    examples = []
    for _ in range(10):
        n = rng.randint(2, 8)
        examples.append({
            "inputs": rng.randint(4, 50, size=n).tolist() + [1],
            "targets": rng.randint(4, 50, size=n).tolist() + [1],
        })
    write_tfrecords(path, examples)
    dl = TransformerDataLayer({
        "mode": "train",
        "data_dir": str(tmp_path),
        "file_pattern": "wmt-train-*",
        "src_vocab_size": 64,
        "batch_size": 4,
        "max_length": 16,
        "shuffle": True,
    }, model=None)
    assert dl.get_size_in_samples() == 10
    batch = next(iter(dl.iterate_one_epoch()))
    x, x_len = batch["source_tensors"]
    y, y_len = batch["target_tensors"]
    assert x.shape[0] == 4
    assert np.all(x_len > 0) and np.all(y_len > 0)
    # EOS-terminated sequences
    assert x[0, x_len[0] - 1] == 1
