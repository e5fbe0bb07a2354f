"""On-device CTC prefix beam search vs exact numpy oracles.

Oracles:
  * a dict-based prefix beam search (same published algorithm, exact
    merge, no pruning beyond top-K) — beams and scores must match;
  * exhaustive alignment enumeration for tiny T/V — with a beam wide
    enough to be exhaustive the top beam must be the true posterior
    argmax label sequence with the true posterior log-probability;
  * `ngram_fusion.sequence_fusion_score` for the shallow-fusion path.
"""
import itertools
from collections import defaultdict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.ops.ctc_beam_tpu import (FusionLM, NEG_INF,
                                              ctc_beam_search_tpu)


def _lse(a, b):
    return np.logaddexp(a, b)


def np_prefix_beam(logp, length, K, lm=None):
    """Exact prefix beam search; ``lm`` = (table, C, m, init_ctx,
    alpha, beta) scoring label extensions like the device op."""
    V = logp.shape[1]
    blank = V - 1
    beams = {(): (0.0, NEG_INF)}
    for t in range(length):
        new = defaultdict(lambda: [NEG_INF, NEG_INF])
        for pref, (pb, pnb) in beams.items():
            tot = _lse(pb, pnb)
            e = new[pref]
            e[0] = _lse(e[0], tot + logp[t, blank])
            if pref:
                e[1] = _lse(e[1], pnb + logp[t, pref[-1]])
            for c in range(V - 1):
                base = pb if (pref and c == pref[-1]) else tot
                s = base + logp[t, c]
                if lm is not None:
                    table, C, m, init_ctx, alpha, beta = lm
                    ctx = init_ctx
                    for tok in pref:
                        ctx = ctx // C + tok * C ** (m - 1)
                    s += alpha * float(table[ctx, c]) + beta
                e2 = new[pref + (c,)]
                e2[1] = _lse(e2[1], s)
        ranked = sorted(new.items(),
                        key=lambda kv: -_lse(kv[1][0], kv[1][1]))
        beams = dict(ranked[:K])
    ranked = sorted(beams.items(),
                    key=lambda kv: -_lse(kv[1][0], kv[1][1]))
    return [(list(p), _lse(pb, pnb)) for p, (pb, pnb) in ranked]


def _run_device(logits, lengths, K, U, fusion=None):
    ids, lens, scores = jax.jit(
        lambda lg, ln: ctc_beam_search_tpu(
            lg, ln, beam_width=K, max_label_len=U, fusion=fusion)
    )(jnp.asarray(logits), jnp.asarray(lengths))
    return (np.asarray(ids), np.asarray(lens), np.asarray(scores))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_exact_prefix_beam(seed):
    rng = np.random.RandomState(seed)
    B, T, V, K = 3, 12, 6, 8
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    lengths = np.array([12, 9, 5], np.int32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ids, lens, scores = _run_device(logits, lengths, K, U=T)
    for b in range(B):
        oracle = np_prefix_beam(logp[b], int(lengths[b]), K)
        got = list(ids[b, 0, :lens[b, 0]])
        assert got == oracle[0][0], (b, got, oracle[0])
        assert scores[b, 0] == pytest.approx(oracle[0][1], abs=1e-3)
        # the whole beam, not just the top hypothesis
        dev = {tuple(ids[b, k, :lens[b, k]]): scores[b, k]
               for k in range(K) if scores[b, k] > NEG_INF / 2}
        for pref, sc in oracle:
            if tuple(pref) in dev:
                assert dev[tuple(pref)] == pytest.approx(sc, abs=1e-3)


def test_exhaustive_tiny_posterior():
    rng = np.random.RandomState(7)
    T, V = 4, 3          # 2 labels + blank; 3^4 = 81 alignments
    logits = rng.randn(1, T, V).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]

    def collapse(path):
        out, prev = [], -1
        for s in path:
            if s != prev and s != V - 1:
                out.append(s)
            prev = s
        return tuple(out)

    post = defaultdict(lambda: NEG_INF)
    for path in itertools.product(range(V), repeat=T):
        lp = sum(logp[t, s] for t, s in enumerate(path))
        lab = collapse(path)
        post[lab] = _lse(post[lab], lp)
    best_lab, best_lp = max(post.items(), key=lambda kv: kv[1])

    # K >= #distinct prefixes reachable => beam search is exact
    ids, lens, scores = _run_device(logits, np.array([T], np.int32),
                                    K=32, U=T)
    got = tuple(ids[0, 0, :lens[0, 0]])
    assert got == best_lab
    assert scores[0, 0] == pytest.approx(best_lp, abs=1e-4)


def test_peaky_matches_greedy():
    """With near-one-hot frames the beam answer is the greedy answer."""
    from openseq2seq_tpu.ops.ctc import ctc_greedy_decode
    rng = np.random.RandomState(3)
    B, T, V = 2, 20, 8
    hot = rng.randint(0, V, size=(B, T))
    logits = np.full((B, T, V), -8.0, np.float32)
    logits[np.arange(B)[:, None], np.arange(T)[None, :], hot] = 8.0
    lengths = np.array([20, 14], np.int32)
    ids, lens, _ = _run_device(logits, lengths, K=4, U=T)
    gids, glens = ctc_greedy_decode(jnp.asarray(logits),
                                    jnp.asarray(lengths))
    for b in range(B):
        want = [i for i in np.asarray(gids)[b] if i >= 0]
        assert list(ids[b, 0, :lens[b, 0]]) == want


def test_emission_frames_on_peaky_lattice():
    """`return_frames` gives each label's emission frame: on a peaky
    lattice, the first frame of each label run (CTC emits when the
    label first enters the prefix)."""
    V, blank = 5, 4
    # frames: a a blank b blank blank c c  -> labels a@0, b@3, c@6
    hot = [0, 0, blank, 1, blank, blank, 2, 2]
    T = len(hot)
    logits = np.full((1, T, V), -9.0, np.float32)
    logits[0, np.arange(T), hot] = 9.0
    ids, lens, _, frames = jax.jit(
        lambda lg, ln: ctc_beam_search_tpu(
            lg, ln, beam_width=4, max_label_len=T, return_frames=True)
    )(jnp.asarray(logits), jnp.asarray([T], np.int32))
    n = int(np.asarray(lens)[0, 0])
    assert list(np.asarray(ids)[0, 0, :n]) == [0, 1, 2]
    assert list(np.asarray(frames)[0, 0, :n]) == [0, 3, 6]
    # padding stays -1
    assert (np.asarray(frames)[0, 0, n:] == -1).all()


def test_frame_asr_word_timestamps_grouping():
    """The on-device beam's (text, per-char frames) pair groups into
    word timestamps exactly like the host decoder's."""
    from openseq2seq_tpu.ops.ctc_beam import group_word_timestamps
    assert group_word_timestamps("ab cd", [2, 3, 5, 7, 8]) == \
        [("ab", 2, 3), ("cd", 7, 8)]


def test_shallow_fusion_matches_oracle(tmp_path):
    from openseq2seq_tpu.ops.ngram_fusion import (build_label_lm,
                                                  dense_label_lm)
    labels = ("a", "b", "c", " ")
    texts = ["abc ab", "ab abc", "cab ba", "abc abc"] * 4
    arpa = build_label_lm(texts, str(tmp_path / "char.arpa"), order=3)
    table, C, m, init_ctx = dense_label_lm(arpa, labels, order=3)
    fusion = FusionLM(jnp.asarray(table), C, m, init_ctx,
                      alpha=0.6, beta=0.25)

    rng = np.random.RandomState(11)
    B, T, V, K = 2, 10, 5, 8            # 4 labels + blank
    logits = rng.randn(B, T, V).astype(np.float32) * 1.5
    lengths = np.array([10, 8], np.int32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    ids, lens, scores = _run_device(logits, lengths, K, U=T,
                                    fusion=fusion)
    lm = (table, C, m, init_ctx, 0.6, 0.25)
    for b in range(B):
        oracle = np_prefix_beam(logp[b], int(lengths[b]), K, lm=lm)
        assert list(ids[b, 0, :lens[b, 0]]) == oracle[0][0]
        assert scores[b, 0] == pytest.approx(oracle[0][1], abs=1e-3)


def test_fc_ctc_decoder_on_device_beam():
    """Decoder-level wiring: on_device_beam_width routes the in-graph
    decode through the TPU beam search with the same output contract
    as greedy (ids padded -1, lengths)."""
    from openseq2seq_tpu.decoders import FullyConnectedCTCDecoder

    V = 6
    dec = FullyConnectedCTCDecoder(
        params={"tgt_vocab_size": V, "use_language_model": False,
                "on_device_beam_width": 4},
        model=None, mode="infer")
    mod = dec.make_module()
    rng = np.random.RandomState(5)
    enc = {"encoder_output": {
        "outputs": jnp.asarray(rng.randn(2, 9, 7).astype(np.float32)),
        "src_length": jnp.asarray(np.array([9, 6], np.int32))}}
    variables = mod.init(jax.random.key(0), enc, False)
    out = jax.jit(lambda v, e: mod.apply(v, e, False))(variables, enc)
    ids, lens = out["outputs"]
    assert ids.shape == (2, 9) and lens.shape == (2,)
    assert out["beam_scores"].shape == (2, 4)
    # matches the exact oracle on the produced logits
    logp = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    for b, L in enumerate([9, 6]):
        oracle = np_prefix_beam(logp[b], L, 4)
        assert list(np.asarray(ids)[b, :int(lens[b])]) == oracle[0][0]


def test_zero_length_and_u_cap():
    rng = np.random.RandomState(9)
    logits = rng.randn(2, 8, 5).astype(np.float32)
    # utterance 0 has zero valid frames -> empty prefix, log prob 0
    ids, lens, scores = _run_device(logits, np.array([0, 8], np.int32),
                                    K=4, U=8)
    assert lens[0, 0] == 0
    assert scores[0, 0] == pytest.approx(0.0, abs=1e-6)
    # U cap: labels-only frames force emission every step; with U=2 the
    # search must stay shape-stable and keep lens <= U
    hot = np.full((1, 8, 3), -9.0, np.float32)
    hot[0, :, 0] = 9.0
    hot[0, 4:, 1] = 19.0
    ids2, lens2, _ = _run_device(hot, np.array([8], np.int32), K=4, U=2)
    assert lens2[0, 0] <= 2
    assert np.all(ids2[0, 0, : lens2[0, 0]] >= 0)


def test_streaming_chunks_match():
    """Chunked beam updates == one-shot decode, bit-identical beams."""
    from openseq2seq_tpu.ops.ctc_beam_tpu import (ctc_beam_init,
                                                  ctc_beam_update)
    rng = np.random.RandomState(21)
    B, T, V, K = 2, 12, 6, 8
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    lengths = np.array([12, 10], np.int32)
    ids1, lens1, scores1 = _run_device(logits, lengths, K, U=T)

    state = ctc_beam_init(B, K, T)
    lg = jnp.asarray(logits)
    done = np.zeros(B, np.int32)
    upd = jax.jit(ctc_beam_update)
    for start, stop in [(0, 5), (5, 9), (9, 12)]:
        valid = np.clip(lengths - start, 0, stop - start)
        state, (ids2, lens2, scores2, frames2) = upd(
            state, lg[:, start:stop], jnp.asarray(valid))
        done += valid
    assert np.array_equal(done, lengths)
    np.testing.assert_array_equal(np.asarray(ids2), ids1)
    np.testing.assert_array_equal(np.asarray(lens2), lens1)
    np.testing.assert_allclose(np.asarray(scores2), scores1, atol=1e-5)
    # streamed emission frames are utterance-absolute: identical to the
    # one-shot decode's
    _, _, _, frames1 = ctc_beam_search_tpu(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=K,
        max_label_len=T, return_frames=True)
    np.testing.assert_array_equal(np.asarray(frames2),
                                  np.asarray(frames1))
