"""BPE subword tokenizer (T2T Subtokenizer parity)."""
import collections

import pytest

from openseq2seq_tpu.data.text2text.tokenizer import (EOS_ID, UNK_ID,
                                                      Subtokenizer)


@pytest.fixture(scope="module")
def trained():
    counts = collections.Counter()
    corpus = ("the quick brown fox jumps over the lazy dog " * 20 +
              "the lazy fox sleeps all day " * 10).split()
    counts.update(corpus)
    return Subtokenizer.train(counts, target_vocab_size=80, min_count=2)


def test_roundtrip(trained):
    text = "the quick fox"
    ids = trained.encode(text)
    assert trained.decode(ids) == text


def test_eos(trained):
    ids = trained.encode("the dog", add_eos=True)
    assert ids[-1] == EOS_ID
    assert trained.decode(ids) == "the dog"


def test_oov_chars_map_to_unk(trained):
    ids = trained.encode("zebra!")
    assert UNK_ID in ids or trained.decode(ids) != ""


def test_frequent_words_become_single_tokens(trained):
    # "the" occurs constantly -> should be a single merged subtoken
    ids = trained.encode("the")
    assert len(ids) == 1


def test_save_load_roundtrip(trained, tmp_path):
    path = str(tmp_path / "bpe.vocab")
    trained.save_vocab(path)
    reloaded = Subtokenizer.from_vocab_file(path)
    text = "the lazy dog sleeps"
    assert reloaded.encode(text) == trained.encode(text)
    assert reloaded.decode(reloaded.encode(text)) == text
