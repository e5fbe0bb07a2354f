"""KenLM ``.binary`` (PROBING format) compatibility of the native LM.

The reference loads KenLM binaries directly (`decoders/scorer.cpp:19-40`
lm::ngram::LoadVirtual); round 3 could only read text ARPA or our own
mmap format. These tests verify the new reader against a GENUINE
KenLM-produced artifact checked into the reference
(`open_seq2seq/test_utils/toy_speech_data/toy_data-lm.binary`, a
trigram over a 91-word toy vocabulary):

* an INDEPENDENT pure-Python parser (struct-level, written from the
  format layout — not from the C++ code) reconstructs the complete
  ARPA from the binary's probing tables;
* the native scorer then loads BOTH files and must produce identical
  log10 conditionals for every stored n-gram AND for backoff paths the
  tables do not contain;
* finally a beam decode over random logits must yield the same
  transcript with either file, i.e. "a KenLM-produced artifact decodes
  identically to its ARPA source".
"""
import itertools
import os
import random
import struct

import numpy as np
import pytest

from openseq2seq_tpu.ops import ctc_beam_native as native

KENLM_FIXTURE = ("/root/reference/open_seq2seq/test_utils/"
                 "toy_speech_data/toy_data-lm.binary")

pytestmark = pytest.mark.skipif(
    not os.path.exists(KENLM_FIXTURE) or not native.available(),
    reason="KenLM fixture or native decoder unavailable")

# KenLM's n-gram key chain constants (lm/model.cc CombineWordHash)
_A = 8978948897894561157
_B = 17894857484156487943
_M = (1 << 64) - 1


def _key(ids):
    h = ids[-1]
    for w in reversed(ids[:-1]):
        h = ((h * _A) ^ ((1 + w) * _B)) & _M
    return h


def _buckets(n, mult):
    return max(n + 1, int(np.float32(mult) * np.float32(n)))


class ParsedKenlm:
    """Struct-level parse of a KenLM PROBING binary (independent of the
    C++ reader; used as ground truth)."""

    def __init__(self, path):
        b = open(path, "rb").read()
        assert b.startswith(b"mmap lm http://kheafield.com/code "
                            b"format version 5\n")
        self.order = b[88]
        mult, = struct.unpack_from("<f", b, 92)
        mtype, has_vocab = struct.unpack_from("<ii", b, 96)
        assert mtype == 0 and has_vocab == 1
        self.counts = [struct.unpack_from("<Q", b, 108 + 8 * i)[0]
                       for i in range(self.order)]
        off = (108 + 8 * self.order + 7) // 8 * 8
        off += 8                                   # vocab header
        off += _buckets(self.counts[0], mult) * 12  # vocab hash table
        # unigrams: (counts[0]+1) x ProbBackoff by word id
        self.uni = [struct.unpack_from("<ff", b, off + 8 * i)
                    for i in range(self.counts[0])]
        off += (self.counts[0] + 1) * 8
        # per-order probing tables
        self.tables = []
        for k in range(2, self.order + 1):
            stride = 16 if k < self.order else 12
            n = _buckets(self.counts[k - 1], mult)
            tab = {}
            for i in range(n):
                if k < self.order:
                    h, p, bo = struct.unpack_from("<Qff", b,
                                                  off + stride * i)
                    if h:
                        tab[h] = (p, bo)
                else:
                    h, p = struct.unpack_from("<Qf", b, off + stride * i)
                    if h:
                        tab[h] = (p, 0.0)
            self.tables.append(tab)
            off += n * stride
        # vocab strings in id order (trailing NUL)
        self.words = [w.decode() for w in b[off:].split(b"\x00") if w]
        assert len(self.words) == self.counts[0]

    def ngrams(self, k):
        """All k-grams as (word-id tuple, log10 prob, backoff)."""
        if k == 1:
            for i, (p, bo) in enumerate(self.uni):
                yield (i,), -abs(p), bo + 0.0
            return
        tab = self.tables[k - 2]
        shorter = [g for g, _, _ in self.ngrams(k - 1)] if k > 2 else \
            [(i,) for i in range(len(self.words))]
        longest = k == self.order
        for prefix in shorter:
            for w in range(len(self.words)):
                h = _key(prefix + (w,))
                if h in tab:
                    p, bo = tab[h]
                    yield prefix + (w,), (p if longest else -abs(p)), \
                        bo + 0.0


@pytest.fixture(scope="module")
def parsed():
    return ParsedKenlm(KENLM_FIXTURE)


@pytest.fixture(scope="module")
def arpa_path(parsed, tmp_path_factory):
    """The ARPA source reconstructed from the binary's own tables."""
    grams = {k: list(parsed.ngrams(k)) for k in range(1, parsed.order + 1)}
    for k in range(1, parsed.order + 1):
        assert len(grams[k]) == parsed.counts[k - 1], \
            "enumeration must recover every stored {}-gram".format(k)
    out = tmp_path_factory.mktemp("kenlm") / "reconstructed.arpa"
    with open(out, "w") as f:
        f.write("\\data\\\n")
        for k in range(1, parsed.order + 1):
            f.write("ngram {}={}\n".format(k, len(grams[k])))
        for k in range(1, parsed.order + 1):
            f.write("\n\\{}-grams:\n".format(k))
            for ids, p, bo in grams[k]:
                text = " ".join(parsed.words[i] for i in ids)
                if k < parsed.order and bo != 0.0:
                    f.write("{:.7g}\t{}\t{:.7g}\n".format(p, text, bo))
                else:
                    f.write("{:.7g}\t{}\n".format(p, text))
        f.write("\n\\end\\\n")
    return str(out)


@pytest.fixture(scope="module")
def scorers(arpa_path):
    s_bin = native.NativeScorer(1.0, 0.0, KENLM_FIXTURE, build_trie=False)
    s_arpa = native.NativeScorer(1.0, 0.0, arpa_path, build_trie=False)
    return s_bin, s_arpa


def test_header_shape(parsed):
    assert parsed.order == 3
    assert parsed.counts == [91, 115, 108]
    assert parsed.words[0] == "<unk>" and parsed.words[1] == "<s>"


def test_stored_ngrams_score_identically(parsed, scorers):
    s_bin, s_arpa = scorers
    checked = 0
    for k in range(1, parsed.order + 1):
        for ids, p, _ in parsed.ngrams(k):
            ctx = [parsed.words[i] for i in ids[:-1]]
            w = parsed.words[ids[-1]]
            got_bin = s_bin.log_cond(ctx, w)
            got_arpa = s_arpa.log_cond(ctx, w)
            assert got_bin == pytest.approx(got_arpa, abs=1e-4), \
                (ctx, w)
            # direct hits return the stored prob itself
            assert got_bin == pytest.approx(p, abs=1e-4), (ctx, w)
            checked += 1
    assert checked == sum(parsed.counts)


def test_backoff_paths_score_identically(parsed, scorers):
    """Tuples NOT in the tables exercise the Katz backoff recursion in
    both backends; scores must still agree."""
    s_bin, s_arpa = scorers
    rng = random.Random(0)
    V = len(parsed.words)
    n = 0
    while n < 300:
        ids = tuple(rng.randrange(V) for _ in range(3))
        ctx = [parsed.words[i] for i in ids[:-1]]
        w = parsed.words[ids[-1]]
        got_bin = s_bin.log_cond(ctx, w)
        got_arpa = s_arpa.log_cond(ctx, w)
        assert got_bin == pytest.approx(got_arpa, abs=1e-4), (ctx, w)
        n += 1


def test_unknown_word_falls_back_to_unk(parsed, scorers):
    s_bin, s_arpa = scorers
    got_bin = s_bin.log_cond(["there"], "zzzznotaword")
    got_arpa = s_arpa.log_cond(["there"], "zzzznotaword")
    assert got_bin == pytest.approx(got_arpa, abs=1e-4)
    assert got_bin < 0


def test_beam_decode_matches_arpa_source(arpa_path):
    """End-to-end: LM-fused beam decode over random logits produces the
    same transcript whether the LM comes from the KenLM binary or its
    ARPA source."""
    alphabet = [" "] + [chr(c) for c in range(ord("a"), ord("z") + 1)] \
        + ["'"]
    V = len(alphabet) + 1
    rng = np.random.RandomState(7)
    logits = rng.randn(60, V).astype(np.float64) * 2.0
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out = []
    for path in (KENLM_FIXTURE, arpa_path):
        scorer = native.NativeScorer(1.5, 0.3, path, build_trie=True)
        res = native.decode(probs.astype(np.float32), alphabet,
                            beam_size=32, scorer=scorer)
        out.append(res[0])
    (score_b, text_b, times_b), (score_a, text_a, times_a) = out
    assert text_b == text_a and times_b == times_a
    # %.7g text round-trip of float32 probs costs ~1e-7 per word score
    assert score_b == pytest.approx(score_a, abs=1e-4)
