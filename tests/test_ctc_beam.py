"""Host-side CTC prefix beam search + ARPA LM + trie (the reference's
native decoder stack, `decoders/` + `ctc_decoder_with_lm/`)."""
import math

import numpy as np
import pytest

from openseq2seq_tpu.ops.arpa_lm import ArpaLM, build_arpa
from openseq2seq_tpu.ops.ctc_beam import (BeamDecoder, CharTrie, Scorer,
                                          ctc_beam_search_decoder,
                                          ctc_beam_search_decoder_batch,
                                          ctc_greedy_decoder)

ALPHABET = [" ", "a", "b", "c", "t"]  # + blank (last id = 5)
BLANK = len(ALPHABET)


def _probs_from_path(path_ids, V=6, peak=0.85):
    T = len(path_ids)
    probs = np.full((T, V), (1 - peak) / (V - 1), np.float64)
    for t, k in enumerate(path_ids):
        probs[t] = (1 - peak) / (V - 1)
        probs[t, k] = peak
    return probs


def test_greedy_decoder_merges():
    ids = [1, 1, BLANK, 2, 2, BLANK, 1]
    probs = _probs_from_path(ids)
    assert ctc_greedy_decoder(probs, ALPHABET) == "aba"


def test_beam_matches_greedy_on_clean_input():
    ids = [4, 1, 4, BLANK, 1]     # t a t _ a -> "tata"... merged: "tata"
    probs = _probs_from_path(ids, peak=0.95)
    res = ctc_beam_search_decoder(probs, ALPHABET, beam_size=8)
    assert res[0][1] == ctc_greedy_decoder(probs, ALPHABET)


def test_beam_sums_over_paths():
    """Beam search must sum path probabilities: two noisy frames where
    'a' has max prob per frame but paths (a,blank),(blank,a),(a,a) merge
    to 'a' while 'b' paths split."""
    probs = np.array([
        [0.0, 0.4, 0.35, 0.0, 0.0, 0.25],
        [0.0, 0.4, 0.35, 0.0, 0.0, 0.25],
    ])
    res = ctc_beam_search_decoder(probs, ALPHABET, beam_size=20)
    assert res[0][1] == "a"


@pytest.fixture(scope="module")
def toy_lm(tmp_path_factory):
    out = tmp_path_factory.mktemp("lm")
    corpus = [["a", "cat"], ["a", "cat"], ["a", "cat"], ["the", "cat"],
              ["a", "tab"]]
    path = build_arpa(corpus, str(out / "toy.arpa"), order=2)
    return path


def test_arpa_lm_scores(toy_lm):
    lm = ArpaLM(toy_lm)
    assert lm.order == 2
    # "cat" follows "a" more often than "tab" does
    assert lm.log10_cond(["a"], "cat") > lm.log10_cond(["a"], "tab")
    # backoff path returns something finite for unseen context
    assert lm.log10_cond(["cat"], "a") > -90


def test_lm_rescoring_fixes_ambiguity(toy_lm):
    """Acoustics slightly prefer 'cab', LM strongly prefers 'cat' →
    beam+LM must output 'a cat'."""
    # "a _ c a X" where X is 52% b / 48% t
    frames = []
    for k in [1, BLANK, 0, 3, 1]:
        row = np.full(6, 0.01)
        row[k] = 0.95
        frames.append(row / row.sum())
    x = np.full(6, 0.005)
    x[2] = 0.52   # 'b'
    x[4] = 0.465  # 't'
    frames.append(x / x.sum())
    probs = np.stack(frames)

    plain = ctc_beam_search_decoder(probs, ALPHABET, beam_size=30)
    assert plain[0][1] == "a cab"
    scorer = Scorer(alpha=2.0, beta=0.0, model_path=toy_lm)
    with_lm = ctc_beam_search_decoder(probs, ALPHABET, beam_size=30,
                                      ext_scorer=scorer)
    assert with_lm[0][1] == "a cat"


def test_trie_constrains_to_vocabulary(toy_lm):
    scorer = Scorer(alpha=0.5, beta=0.0, model_path=toy_lm)
    # 'x'-like garbage word "ct" not in trie -> pruned
    assert scorer.trie.walk("ca") is not None
    assert scorer.trie.walk("ct") is None
    frames = []
    for k in [3, 4]:   # "ct"
        row = np.full(6, 0.02)
        row[k] = 0.9
        frames.append(row / row.sum())
    probs = np.stack(frames)
    res = ctc_beam_search_decoder(probs, ALPHABET, beam_size=10,
                                  ext_scorer=scorer)
    assert res[0][1] != "ct"


def test_char_trie():
    trie = CharTrie.from_words(["cat", "cab", "a"])
    assert trie.walk("ca").children.keys() == {"t", "b"}
    assert trie.walk("cat").is_word
    assert trie.walk("z") is None


def test_batch_decoder():
    ids1 = [1, BLANK, 2]
    ids2 = [4, 4, BLANK]
    probs = [_probs_from_path(ids1), _probs_from_path(ids2)]
    res = ctc_beam_search_decoder_batch(probs, [3, 3], ALPHABET,
                                        beam_size=5)
    assert res[0][0][1] == "ab"
    assert res[1][0][1] == "t"


def test_streaming_beam_decoder_with_timestamps():
    dec = BeamDecoder(ALPHABET, beam_size=8)
    # feed "ta" then " b": chunks across a word boundary
    chunk1 = _probs_from_path([4, 1], peak=0.95)
    chunk2 = _probs_from_path([0, 2], peak=0.95)
    assert dec.decode(chunk1) == "ta"
    assert dec.decode(chunk2) == "ta b"
    words = dec.get_word_timestamps()
    assert [w[0] for w in words] == ["ta", "b"]
    assert words[0][1] == 0            # 't' at frame 0
    assert words[1][1] == 3            # 'b' at frame 3
    dec.reset()
    assert dec.decode(_probs_from_path([2], peak=0.95)) == "b"


# ---------------------------------------------------------------------------
# native C++ decoder equivalence
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def native():
    from openseq2seq_tpu.ops import ctc_beam_native
    if not ctc_beam_native.build():
        pytest.skip("native decoder toolchain unavailable")
    assert ctc_beam_native.available()
    return ctc_beam_native


def test_native_matches_python_plain(native):
    rng = np.random.RandomState(0)
    for trial in range(5):
        T = rng.randint(5, 20)
        logits = rng.randn(T, 6) * 2
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        py = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16)
        nat = native.decode(probs, ALPHABET, beam_size=16)
        assert nat[0][1] == py[0][1], "trial {}".format(trial)
        assert nat[0][0] == pytest.approx(py[0][0], rel=1e-4)


def test_native_matches_python_with_lm(native, toy_lm):
    scorer_py = Scorer(alpha=1.5, beta=0.5, model_path=toy_lm)
    scorer_nat = native.NativeScorer(alpha=1.5, beta=0.5,
                                     arpa_path=toy_lm)
    rng = np.random.RandomState(1)
    chars = {c: i for i, c in enumerate(ALPHABET)}
    for trial in range(4):
        # acoustics biased toward "a cat"-like strings + noise
        path = [chars[c] for c in "a cat"] + [BLANK]
        T = len(path)
        probs = np.full((T, 6), 0.05)
        for t, k in enumerate(path):
            probs[t, k] = 0.5 + 0.3 * rng.rand()
        probs = probs / probs.sum(-1, keepdims=True)
        py = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16,
                                     ext_scorer=scorer_py)
        nat = native.decode(probs, ALPHABET, beam_size=16,
                            scorer=scorer_nat)
        assert nat[0][1] == py[0][1], "trial {}".format(trial)
        assert nat[0][0] == pytest.approx(py[0][0], rel=1e-3)


def test_native_batch_and_threads(native):
    rng = np.random.RandomState(2)
    probs_list, lens = [], []
    for _ in range(6):
        T = rng.randint(4, 12)
        logits = rng.randn(T, 6)
        probs_list.append(np.exp(logits) /
                          np.exp(logits).sum(-1, keepdims=True))
        lens.append(T)
    nat = native.decode_batch(probs_list, lens, ALPHABET, beam_size=8,
                              num_threads=3)
    for i in range(6):
        py = ctc_beam_search_decoder(probs_list[i], ALPHABET, beam_size=8)
        assert nat[i][0][1] == py[0][1]


def test_native_streaming(native):
    dec = native.NativeStreamingDecoder(ALPHABET, beam_size=8)
    chunk1 = _probs_from_path([4, 1], peak=0.95)
    chunk2 = _probs_from_path([0, 2], peak=0.95)
    assert dec.decode(chunk1.astype(np.float32)) == "ta"
    assert dec.decode(chunk2.astype(np.float32)) == "ta b"
    words = dec.get_word_timestamps()
    assert [w[0] for w in words] == ["ta", "b"]
    assert words[1][1] == 3
    dec.reset()
    assert dec.decode(_probs_from_path([2], peak=0.95)
                      .astype(np.float32)) == "b"


@pytest.fixture(scope="module")
def char_lm(tmp_path_factory):
    """Character-level ARPA (every vocab entry is one char) — the
    Mandarin-style mode of the reference scorer (`scorer.h:60-89`)."""
    out = tmp_path_factory.mktemp("charlm") / "char.arpa"
    corpus = [list("acat"), list("acab"), list("acat"),
              list("batcat"), list("atab")]  # no spaces: ARPA tokens
                                             # are whitespace-delimited
    build_arpa(corpus, str(out), order=3)
    return str(out)


def test_character_lm_detection_and_scoring(char_lm, toy_lm):
    sc = Scorer(alpha=1.2, beta=0.3, model_path=char_lm)
    assert sc.is_character_based
    assert sc.trie is None           # no vocabulary constraint
    sw = Scorer(alpha=1.2, beta=0.3, model_path=toy_lm)
    assert not sw.is_character_based

    # acoustically ambiguous 't' vs 'b' after "a ca": the char LM
    # prefers the higher-count continuation "a cat"
    chars = {c: i for i, c in enumerate(ALPHABET)}
    path = [chars[c] for c in "aca"]
    T = len(path) + 1
    probs = np.full((T, 6), 0.02)
    for t, k in enumerate(path):
        probs[t, k] = 0.9
    probs[-1, chars["t"]] = 0.45     # tie between 't' and 'b'
    probs[-1, chars["b"]] = 0.45
    probs = probs / probs.sum(-1, keepdims=True)
    no_lm = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16)
    with_lm = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16,
                                      ext_scorer=sc)
    assert with_lm[0][1] == "acat"
    assert no_lm[0][1] in ("acat", "acab")


def test_native_matches_python_character_lm(native, char_lm):
    scorer_py = Scorer(alpha=1.2, beta=0.3, model_path=char_lm)
    assert scorer_py.is_character_based
    scorer_nat = native.NativeScorer(alpha=1.2, beta=0.3,
                                     arpa_path=char_lm)
    rng = np.random.RandomState(3)
    for trial in range(4):
        T = rng.randint(5, 14)
        logits = rng.randn(T, 6) * 2
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        py = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16,
                                     ext_scorer=scorer_py)
        nat = native.decode(probs, ALPHABET, beam_size=16,
                            scorer=scorer_nat)
        assert nat[0][1] == py[0][1], "trial {}".format(trial)
        assert nat[0][0] == pytest.approx(py[0][0], rel=1e-3)


# ---------------------------------------------------------------------------
# binary LM format, dictionary-constrained mode, n-best
# ---------------------------------------------------------------------------

def test_binary_lm_matches_arpa(native, toy_lm, tmp_path):
    """The mmap binary format must score identically to the text ARPA —
    in both the Python loader and the native decoder (reference loads
    KenLM *binaries*, `decoders/scorer.cpp:60-62`)."""
    blm = str(tmp_path / "toy.blm")
    native.binarize(toy_lm, blm)
    lm_txt = ArpaLM(toy_lm)
    lm_bin = ArpaLM(blm)
    assert lm_bin.order == lm_txt.order
    for ctx, w in [([], "cat"), (["a"], "cat"), (["a"], "tab"),
                   (["the"], "cat"), (["cat"], "a"), (["zzz"], "cat")]:
        assert lm_bin.log10_cond(ctx, w) == pytest.approx(
            lm_txt.log10_cond(ctx, w), abs=1e-5)
    # native decode with the binary LM == native decode with the ARPA
    sc_txt = native.NativeScorer(alpha=1.5, beta=0.5, arpa_path=toy_lm)
    sc_bin = native.NativeScorer(alpha=1.5, beta=0.5, arpa_path=blm)
    rng = np.random.RandomState(4)
    for _ in range(3):
        logits = rng.randn(10, 6) * 2
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        a = native.decode(probs, ALPHABET, beam_size=16, scorer=sc_txt)
        b = native.decode(probs, ALPHABET, beam_size=16, scorer=sc_bin)
        assert a[0][1] == b[0][1]
        assert a[0][0] == pytest.approx(b[0][0], rel=1e-6)


def test_dictionary_constrained_mode(native, toy_lm):
    """FSTMATCH-equivalent hard lexicon constraint: completed words must
    exist in the vocabulary, not merely extend a trie prefix (reference
    `decoders/ctc_beam_search_decoder.cpp:104-120`)."""
    chars = {c: i for i, c in enumerate(ALPHABET)}
    # acoustics strongly say "ca " — 'ca' is a valid trie PREFIX
    # ("cat"/"cab") but not a complete word
    path = [chars[c] for c in "ca "] + [chars["a"]]
    probs = np.full((len(path), 6), 0.02)
    for t, k in enumerate(path):
        probs[t, k] = 0.9
    probs = probs / probs.sum(-1, keepdims=True)

    plain = Scorer(alpha=0.3, beta=0.0, model_path=toy_lm)
    res_plain = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16,
                                        ext_scorer=plain)
    assert res_plain[0][1].startswith("ca ")   # prefix constraint only

    constrained = Scorer(alpha=0.3, beta=0.0, model_path=toy_lm,
                         dict_constrained=True)
    res_dict = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16,
                                       ext_scorer=constrained)
    closed = res_dict[0][1].split(" ")[:-1]    # completed words only
    assert all(w in ("a", "cat", "cab", "tab", "the") for w in closed), \
        res_dict[0][1]

    # native twin must agree
    sc_nat = native.NativeScorer(alpha=0.3, beta=0.0, arpa_path=toy_lm,
                                 dict_constrained=True)
    nat = native.decode(probs, ALPHABET, beam_size=16, scorer=sc_nat)
    assert nat[0][1] == res_dict[0][1]
    assert nat[0][0] == pytest.approx(res_dict[0][0], rel=1e-3)


def test_nbest_decoding(native, toy_lm):
    """n-best output: best-first, first entry == 1-best, scores
    descending; native and Python fallback agree."""
    from openseq2seq_tpu.ops.ctc_beam import ctc_beam_search_decoder_nbest
    rng = np.random.RandomState(5)
    logits = rng.randn(12, 6) * 1.5
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    nb = ctc_beam_search_decoder_nbest(probs, ALPHABET, nbest=5,
                                       beam_size=16)
    assert 1 <= len(nb) <= 5
    scores = [s for s, _ in nb]
    assert scores == sorted(scores, reverse=True)
    assert len({t for _, t in nb}) == len(nb)    # distinct hypotheses
    one_best = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16)
    assert nb[0][1] == one_best[0][1]

    # with LM scorer: native path must match the Python oracle's ranking
    scorer = Scorer(alpha=1.0, beta=0.2, model_path=toy_lm)
    nb_lm = ctc_beam_search_decoder_nbest(probs, ALPHABET, nbest=4,
                                          beam_size=16, ext_scorer=scorer)
    py = ctc_beam_search_decoder(probs, ALPHABET, beam_size=16,
                                 ext_scorer=scorer)
    assert nb_lm[0][1] == py[0][1]


def test_batch_decode_with_lm_uses_native(native, toy_lm):
    """ctc_beam_search_decoder_batch with a scorer must produce the
    Python oracle's transcripts (it now dispatches to C++)."""
    scorer = Scorer(alpha=1.5, beta=0.5, model_path=toy_lm)
    rng = np.random.RandomState(6)
    probs_list, lens = [], []
    for _ in range(4):
        T = rng.randint(5, 12)
        logits = rng.randn(T, 6) * 2
        probs_list.append(np.exp(logits) /
                          np.exp(logits).sum(-1, keepdims=True))
        lens.append(T)
    batch = ctc_beam_search_decoder_batch(probs_list, lens, ALPHABET,
                                          beam_size=16,
                                          ext_scorer=scorer)
    assert scorer._native_scorer is not None   # the dispatch happened
    for i in range(4):
        py = ctc_beam_search_decoder(probs_list[i], ALPHABET,
                                     beam_size=16, ext_scorer=scorer)
        assert batch[i][0][1] == py[0][1]
