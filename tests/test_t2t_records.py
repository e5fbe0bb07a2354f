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


def test_imagenet_tfrecord_layer(tmp_path):
    """TFRecord ImageNet shard with PNG-encoded images parsed end to end."""
    import io
    from PIL import Image
    from openseq2seq_tpu.utils.tb_writer import _masked_crc, _varint
    import struct

    def encode_bytes_feature(data: bytes) -> bytes:
        inner = _varint(1 << 3 | 2) + _varint(len(data)) + data
        return _varint(1 << 3 | 2) + _varint(len(inner)) + inner

    def encode_int64_feature(v: int) -> bytes:
        packed = _varint(v)
        inner = _varint(1 << 3 | 2) + _varint(len(packed)) + packed
        return _varint(3 << 3 | 2) + _varint(len(inner)) + inner

    def entry(key: str, feature: bytes) -> bytes:
        e = (_varint(1 << 3 | 2) + _varint(len(key)) + key.encode() +
             _varint(2 << 3 | 2) + _varint(len(feature)) + feature)
        return _varint(1 << 3 | 2) + _varint(len(e)) + e

    path = str(tmp_path / "validation-00000-of-00001")
    with open(path, "wb") as f:
        rng = np.random.RandomState(0)
        for i in range(3):
            img = Image.fromarray(
                rng.randint(0, 255, size=(64, 48, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            entries = (entry("image/encoded",
                             encode_bytes_feature(buf.getvalue())) +
                       entry("image/class/label",
                             encode_int64_feature(i + 1)))
            payload = _varint(1 << 3 | 2) + _varint(len(entries)) + entries
            header = struct.pack("<Q", len(payload))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(payload)
            f.write(struct.pack("<I", _masked_crc(payload)))

    from openseq2seq_tpu.data.image2label import ImagenetTFRecordDataLayer
    dl = ImagenetTFRecordDataLayer({
        "mode": "eval", "data_dir": str(tmp_path), "batch_size": 2,
        "image_size": 32, "shuffle": False,
    }, model=None)
    assert dl.get_size_in_samples() == 3
    batches = list(dl.iterate_one_epoch())
    assert batches[0]["source_tensors"][0].shape == (2, 32, 32, 3)
    assert np.asarray(batches[0]["target_tensors"][0]).tolist() == [0, 1]


def test_transformer_layer_wordpiece_detok(tmp_path):
    """vocab_file enables true wordpiece detokenization in decode_ids
    (the reference detokenizes TransformerDataLayer output through its
    T2T Subtokenizer)."""
    from openseq2seq_tpu.data.text2text.wordpiece import (
        WordpieceSubtokenizer)
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["the quick brown fox jumps",
                                 "the lazy dog sleeps"] * 30))
    vocab = str(tmp_path / "wp.vocab")
    tok = WordpieceSubtokenizer.init_from_files(
        vocab, [str(corpus)], target_vocab_size=100, threshold=50,
        min_count=2)
    sent = "the quick dog"
    ids = tok.encode(sent, add_eos=True)
    path = str(tmp_path / "wmt-train-00000-of-00001")
    write_tfrecords(path, [{"inputs": ids, "targets": ids}])
    dl = TransformerDataLayer({
        "mode": "train",
        "data_dir": str(tmp_path),
        "file_pattern": "wmt-train-*",
        "src_vocab_size": tok.vocab_size,
        "batch_size": 1,
        "max_length": 32,
        "shuffle": False,
        "vocab_file": vocab,
    }, model=None)
    batch = next(iter(dl.iterate_one_epoch()))
    y, y_len = batch["target_tensors"]
    assert dl.decode_ids(y[0][:int(y_len[0])]) == sent
