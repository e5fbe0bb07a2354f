"""T2T wordpiece subtokenizer parity (reference
`open_seq2seq/data/text2text/tokenizer.py:61-611`).

The reference implementation itself is loaded as a runtime ORACLE (its
only hard dependency, TF, is satisfied with a minimal shim) and every
behavior is cross-checked:

* training on the same corpus produces the byte-identical vocab file
  (both with explicit min_count and with the binary-searched
  target_vocab_size path);
* encoding fixture strings with a reference-produced vocab file yields
  the reference's integer ids token-for-token;
* decode round-trips, including escape-character edge cases.
"""
import importlib.util
import os
import sys
import types

import pytest

from openseq2seq_tpu.data.text2text import wordpiece

REF_TOKENIZER = "/root/reference/open_seq2seq/data/text2text/tokenizer.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_TOKENIZER),
                                reason="reference tokenizer unavailable")


def _load_reference_oracle():
    """Import the reference Subtokenizer with a minimal tf shim."""
    if "tensorflow" not in sys.modules or \
            not hasattr(sys.modules["tensorflow"], "_os2s_shim"):
        tf = types.ModuleType("tensorflow")
        tf._os2s_shim = True

        class _Reader:
            def __init__(self, path, mode):
                self._f = open(path, mode, encoding="utf-8")
                self._path = path

            def size(self):
                return os.path.getsize(self._path)

            def __iter__(self):
                return iter(self._f)

            def __enter__(self):
                return self

            def __exit__(self, *a):
                self._f.close()

            def write(self, s):
                self._f.write(s)

        tf.gfile = types.SimpleNamespace(
            Exists=os.path.exists,
            Open=lambda path, mode="r": _Reader(path, mode))
        tf.logging = types.SimpleNamespace(info=lambda *a, **k: None)
        sys.modules["tensorflow"] = tf
    spec = importlib.util.spec_from_file_location("_ref_tokenizer",
                                                  REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_reference_oracle()


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "ein schneller brauner fuchs springt",
    "the dog sleeps, the fox runs!",
    "under_score and back\\slash survive escaping",
    "numbers 12345 and 99 mix with words",
    "quick quick quick brown brown fox",
    "Umlaute: über öfter ähnlich",
    "the fox, the dog, the fox; the dog.",
] * 150  # large enough that the reference's binary search over
         # min_count in [1, 1000] never empties its subtoken buckets
         # (it crashes on corpora where nothing appears min_count times)

FIXTURE_STRINGS = [
    "the quick brown fox",
    "a dog under_score jumps!",
    "unseen wörds 77 appear\\here",
    "  leading spaces and , punctuation ;",
    "",
]


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wp") / "corpus.txt"
    p.write_text("\n".join(CORPUS), encoding="utf-8")
    return str(p)


def _vocabs(tmp_path, ref, corpus_file, **kwargs):
    ref_vocab = str(tmp_path / "ref.vocab")
    our_vocab = str(tmp_path / "ours.vocab")
    ref_tok = ref.Subtokenizer.init_from_files(
        ref_vocab, [corpus_file], **kwargs)
    our_tok = wordpiece.WordpieceSubtokenizer.init_from_files(
        our_vocab, [corpus_file], **kwargs)
    return ref_vocab, our_vocab, ref_tok, our_tok


def test_training_matches_reference_fixed_min_count(ref, corpus_file,
                                                    tmp_path):
    ref_vocab, our_vocab, ref_tok, our_tok = _vocabs(
        tmp_path, ref, corpus_file,
        target_vocab_size=200, threshold=50, min_count=2)
    assert open(our_vocab, encoding="utf-8").read() == \
        open(ref_vocab, encoding="utf-8").read()
    for s in FIXTURE_STRINGS:
        assert our_tok.encode(s) == ref_tok.encode(s), s
        assert our_tok.encode(s, add_eos=True) == \
            ref_tok.encode(s, add_eos=True), s


def test_training_matches_reference_binary_search(ref, corpus_file,
                                                  tmp_path):
    """min_count=None exercises the binary-searched target size."""
    ref_vocab, our_vocab, ref_tok, our_tok = _vocabs(
        tmp_path, ref, corpus_file,
        target_vocab_size=120, threshold=5, min_count=None)
    assert open(our_vocab, encoding="utf-8").read() == \
        open(ref_vocab, encoding="utf-8").read()
    # the toy corpus saturates below the target; what matters is that
    # both searches converge to the same point
    assert our_tok.vocab_size == len(ref_tok.subtoken_list) > 80


def test_reference_vocab_file_reproduces_reference_ids(ref, corpus_file,
                                                       tmp_path):
    """Loading a REFERENCE-written vocab file must reproduce its ids —
    the round-3 gap: 'cannot reuse a reference-released vocab file'."""
    ref_vocab = str(tmp_path / "ref.vocab")
    ref_tok = ref.Subtokenizer.init_from_files(
        ref_vocab, [corpus_file], target_vocab_size=200, threshold=50,
        min_count=2)
    ours = wordpiece.WordpieceSubtokenizer(ref_vocab)
    assert ours.subtoken_list == ref_tok.subtoken_list
    for s in FIXTURE_STRINGS + CORPUS[:8]:
        ids = ours.encode(s)
        assert ids == ref_tok.encode(s), s
        assert ours.decode(ids) == ref_tok.decode(ids)


def test_decode_round_trip(ref, corpus_file, tmp_path):
    _, _, ref_tok, our_tok = _vocabs(
        tmp_path, ref, corpus_file,
        target_vocab_size=200, threshold=50, min_count=2)
    for s in ["the fox", "under_score \\ test", "mixed 42 numbers",
              "über fox"]:
        assert our_tok.decode(our_tok.encode(s)) == \
            ref_tok.decode(ref_tok.encode(s))


def test_split_and_escape_edge_cases():
    assert wordpiece.split_string_to_tokens(" lead") == [" ", "lead"]
    assert wordpiece.split_string_to_tokens("a b") == ["a", "b"]
    assert wordpiece.split_string_to_tokens("a  b") == ["a", "  ", "b"]
    assert wordpiece.split_string_to_tokens("a, b") == ["a", ", ", "b"]
    alphabet = set("ab_\\u;0123456789")
    esc = wordpiece.escape_token("a_b\\c", alphabet)
    assert esc == "a\\ub\\\\\\99;_"
    assert wordpiece.unescape_token(esc[:-1]) == "a_b\\c"
