"""KenLM trie-family ``.binary`` compatibility of the native LM.

The reference's published LM recipe builds `build_binary trie -q 8 -b 7
-a 256` (reference scripts/build_lm.py:38) — QUANT_ARRAY_TRIE — so the
trie family, not PROBING, is the format real reference users hold.
Round 4 adds a direct reader for all four trie model types
(``native/ctc_decoder/ngram_lm.cc:LoadKenlmTrie``). Coverage:

* the GENUINE KenLM-produced trie artifact checked into the reference
  (`ctc_decoder_with_lm/ctc-test-lm.binary`, an order-2 `-q 8 -b 7`
  QUANT_ARRAY_TRIE) must yield the exact stored probabilities,
  backoff-path scores, and <unk> fallback (hand-decoded expectations);
* higher-order tries (which exercise the bit-packed middle levels and
  the bhiksha offsets array that the order-2 fixture cannot) are
  synthesized by an independent Python writer following the same layout
  spec (tests/kenlm_trie_writer.py) for every model type x order x
  bhiksha-chop combination, and must score identically to the ARPA
  text the n-grams came from.
"""
import os
import random

import numpy as np
import pytest

from openseq2seq_tpu.ops import ctc_beam_native as native
from tests.kenlm_trie_writer import write_trie_binary, chop_bits, \
    required_bits

TRIE_FIXTURE = "/root/reference/ctc_decoder_with_lm/ctc-test-lm.binary"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder unavailable")


# ---------------------------------------------------------------------------
# the real KenLM artifact
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(TRIE_FIXTURE),
                    reason="reference fixture unavailable")
def test_reference_quant_array_trie_fixture():
    """Hand-decoded expectations for the KenLM-built order-2 fixture
    (vocab <unk>/<s>/ten/seconds/</s>; all three stored bigrams carry
    quant bin 85 = -0.18988; unigram probs/backoffs raw)."""
    s = native.NativeScorer(1.0, 0.0, TRIE_FIXTURE, build_trie=False)
    q = -0.18987952172756195
    assert s.log_cond(["<s>"], "ten") == pytest.approx(q, abs=1e-6)
    assert s.log_cond(["ten"], "seconds") == pytest.approx(q, abs=1e-6)
    assert s.log_cond(["seconds"], "</s>") == pytest.approx(q, abs=1e-6)
    uni = -0.5351132154464722
    assert s.log_cond([], "ten") == pytest.approx(uni, abs=1e-6)
    # backoff path: "seconds ten" is not stored
    assert s.log_cond(["seconds"], "ten") == pytest.approx(
        -0.30103 + uni, abs=1e-5)
    # unknown words take <unk>'s unigram prob
    assert s.log_cond([], "zzznotaword") == pytest.approx(
        -0.90309, abs=1e-5)


@pytest.mark.skipif(not os.path.exists(TRIE_FIXTURE),
                    reason="reference fixture unavailable")
def test_reference_fixture_beam_decodes():
    """The trie-backed scorer works end-to-end through beam decode."""
    alphabet = [" "] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    V = len(alphabet) + 1
    rng = np.random.RandomState(3)
    logits = rng.randn(40, V).astype(np.float64)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    scorer = native.NativeScorer(1.0, 0.5, TRIE_FIXTURE, build_trie=True)
    res = native.decode(probs.astype(np.float32), alphabet,
                        beam_size=8, scorer=scorer)
    assert res and isinstance(res[0][1], str)


# ---------------------------------------------------------------------------
# synthesized higher-order tries vs their ARPA source
# ---------------------------------------------------------------------------

def _random_lm(order, seed, n_sentences=40, vocab=12):
    """Suffix-closed n-gram set from a random corpus (sliding windows
    guarantee every k-gram's (k-1)-suffix is an observed (k-1)-gram).
    Values land on a coarse grid so quantized bins stay exact."""
    rng = random.Random(seed)
    words = ["w%d" % i for i in range(vocab)]
    grams = {}
    for _ in range(n_sentences):
        sent = [rng.choice(words) for _ in range(rng.randint(3, 9))]
        for k in range(1, order + 1):
            for i in range(len(sent) - k + 1):
                grams.setdefault(tuple(sent[i:i + k]), None)
    for w in words + ["<unk>"]:
        grams.setdefault((w,), None)
    out = {}
    for g in grams:
        p = -round(rng.uniform(0.05, 4.0) * 20) / 20.0
        bo = 0.0 if rng.random() < 0.3 else \
            round(rng.uniform(-1.0, 0.5) * 20) / 20.0
        out[g] = (p, bo if len(g) < order else 0.0)
    return out


def _write_arpa(path, ngrams, order):
    grams = {k: [] for k in range(1, order + 1)}
    for g, (p, bo) in ngrams.items():
        grams[len(g)].append((g, p, bo))
    with open(path, "w") as f:
        f.write("\\data\\\n")
        for k in range(1, order + 1):
            f.write("ngram %d=%d\n" % (k, len(grams[k])))
        for k in range(1, order + 1):
            f.write("\n\\%d-grams:\n" % k)
            for g, p, bo in grams[k]:
                if k < order and bo != 0.0:
                    f.write("%.7g\t%s\t%.7g\n" % (p, " ".join(g), bo))
                else:
                    f.write("%.7g\t%s\n" % (p, " ".join(g)))
        f.write("\n\\end\\\n")


@pytest.mark.parametrize("order,quantized,arrayed,conf_bits", [
    (3, False, False, 0),    # TRIE
    (3, True, False, 0),     # QUANT_TRIE
    (3, False, True, 255),   # ARRAY_TRIE
    (3, True, True, 255),    # QUANT_ARRAY_TRIE (the reference's format)
    (5, True, True, 255),    # deep middles
    (4, True, True, 2),      # forced small chop
    (2, True, True, 255),    # no middles at all
])
def test_trie_scores_match_arpa(tmp_path, order, quantized, arrayed,
                                conf_bits):
    ngrams = _random_lm(order, seed=order * 101 + conf_bits)
    arpa = str(tmp_path / "lm.arpa")
    binp = str(tmp_path / "lm.binary")
    _write_arpa(arpa, ngrams, order)
    counts = write_trie_binary(binp, ngrams, order, quantized=quantized,
                               arrayed=arrayed, conf_bits=conf_bits)
    assert counts[0] >= 13
    s_bin = native.NativeScorer(1.0, 0.0, binp, build_trie=False)
    s_arpa = native.NativeScorer(1.0, 0.0, arpa, build_trie=False)
    words = sorted(g[0] for g in ngrams if len(g) == 1)
    # every stored n-gram is a direct hit in both backends
    for g, (p, bo) in ngrams.items():
        got_bin = s_bin.log_cond(list(g[:-1]), g[-1])
        got_arpa = s_arpa.log_cond(list(g[:-1]), g[-1])
        assert got_bin == pytest.approx(got_arpa, abs=1e-5), g
        assert got_bin == pytest.approx(p, abs=1e-5), g
    # random tuples exercise the Katz backoff recursion
    rng = random.Random(7)
    for _ in range(300):
        k = rng.randint(1, order)
        g = tuple(rng.choice(words) for _ in range(k))
        got_bin = s_bin.log_cond(list(g[:-1]), g[-1])
        got_arpa = s_arpa.log_cond(list(g[:-1]), g[-1])
        assert got_bin == pytest.approx(got_arpa, abs=1e-5), g


def test_bhiksha_chop_saves_bits():
    """Sanity of the chop model: with enough entries the array always
    chops something, and inline bits shrink accordingly."""
    assert chop_bits(10_000, 50_000, 255) > 0
    assert chop_bits(2, 50_000, 255) == 0  # table never pays for itself
    assert chop_bits(10_000, 50_000, 2) <= 2
    assert required_bits(5) == 3 and required_bits(8) == 4
