"""On-device CTC prefix beam search — the TPU-native counterpart of the
host-side C++ decoder.

The reference frames beam+LM decoding as a host/CPU op
(`/root/reference/decoders/ctc_beam_search_decoder.cpp`, a PathTrie of
heap-allocated prefixes): data-dependent pointer chasing that cannot
live inside a jitted TPU program, so every batch of logits pays a
device->host round trip before any text exists. Here the same published
algorithm (Hannun et al. 2014 prefix beam search: per-prefix blank /
non-blank probability pair, merge-on-equal-prefix) is restated with
static shapes so the whole search runs inside one `lax.scan`:

  * A beam is K rows of a fixed-width token matrix plus per-row scalars
    (length, last label, rolling prefix hashes, log p_blank/p_nonblank,
    LM context). No trees, no allocation.
  * Each frame expands all K x V candidates at once: column `blank`
    is the "stay" candidate (its p_b absorbs the blank extension, its
    p_nb the repeated-last-label extension — the two lattice moves that
    keep the prefix unchanged), the V-1 label columns are "extend"
    candidates scored from p_b (same label) or p_b+p_nb (new label).
  * The merge step — the part that is a hash table on CPUs — becomes
    sort-by-prefix-hash + segmented log-sum-exp + top-K: identical
    prefixes reached through different parents sit adjacent after a
    lexsort on (two independent 32-bit rolling hashes, exact prefix
    length), and `jax.ops.segment_{max,sum}` folds their probabilities.
    A spurious fuse needs a simultaneous collision of both hashes AND
    an equal length — vanishingly rare over K*V ~ 500 candidates, and
    at worst it perturbs one beam slot.
  * Optional shallow fusion reuses the dense n-gram table of
    `ops/ngram_fusion.py` (one int32 rolling context per beam, one
    gather per step) — the on-device analogue of the reference
    Scorer's per-expansion KenLM lookup
    (`/root/reference/decoders/scorer.cpp`).

Everything is float32/int32 with a finite ``NEG_INF`` so fully-dead
lanes never produce NaNs. Complexity per utterance: T scan steps of
O(K V log(K V)) sort work + O(K U) state gathers — all VPU-friendly,
batched via `vmap`.

Host-side beam+LM decoding (`ops/ctc_beam.py` / `native/ctc_decoder/`)
remains the path for WORD-level KenLM fusion and very wide beams; this
op serves batch/serving-style decoding where the text must come back
with the logits in one device program.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30
_P1 = jnp.uint32(1000003)
_P2 = jnp.uint32(16777619)


class FusionLM(NamedTuple):
    """Dense label-level LM for shallow fusion (`dense_label_lm`)."""
    table: jax.Array   # (C**m, V-1) natural-log P(label | ctx)
    C: int             # context base (V, i.e. labels + BOS pad)
    m: int             # context length (order - 1)
    init_ctx: int      # all-BOS start row
    alpha: float       # LM weight
    beta: float        # per-label insertion bonus


def _lse(a, b):
    return jnp.maximum(jnp.logaddexp(a, b), NEG_INF)


def _beam_step(state, inputs, *, K, V, U, fusion: Optional[FusionLM]):
    toks, lens, last, h1, h2, ctx, p_b, p_nb, frames = state
    logp, active, t = inputs                  # (V,), bool, int32 scalars
    blank = V - 1

    # ---- candidate grid (K, V): column `blank` = stay, else extend
    c = jnp.arange(V)[None, :]                               # (1, V)
    is_stay = c == blank
    tot = _lse(p_b, p_nb)[:, None]                           # (K, 1)
    # stay: blank extension feeds p_b, repeated-last feeds p_nb
    stay_b = tot + logp[blank]
    stay_nb = jnp.where(lens > 0,
                        p_nb + logp[jnp.clip(last, 0, V - 1)],
                        NEG_INF)[:, None]
    # extend with label c: from p_b only when c repeats the last label
    base = jnp.where(c == last[:, None], p_b[:, None], tot)
    ext_score = base + logp[None, :]
    if fusion is not None:
        lm_row = fusion.table[ctx]                           # (K, V-1)
        lm_bonus = jnp.pad(fusion.alpha * lm_row + fusion.beta,
                           ((0, 0), (0, 1)))                 # blank col 0
        ext_score = ext_score + lm_bonus
    cand_b = jnp.where(is_stay, stay_b, NEG_INF)             # (K, V)
    cand_nb = jnp.where(is_stay, stay_nb,
                        jnp.maximum(ext_score, NEG_INF))
    step = jnp.where(is_stay, jnp.uint32(0), c.astype(jnp.uint32) + 1)
    cand_h1 = jnp.where(is_stay, h1[:, None], h1[:, None] * _P1 + step)
    cand_h2 = jnp.where(is_stay, h2[:, None], h2[:, None] * _P2 + step)
    # exact prefix length joins the merge key as a free tiebreaker:
    # two distinct prefixes must now collide on BOTH 32-bit hashes AND
    # share a length before they can be fused
    cand_len = lens[:, None] + (~is_stay).astype(lens.dtype)  # (K, V)
    parent = jnp.broadcast_to(jnp.arange(K)[:, None], (K, V))

    N = K * V
    f = lambda a: a.reshape(N)
    cand_b, cand_nb = f(cand_b), f(cand_nb)
    cand_h1, cand_h2 = f(cand_h1), f(cand_h2)
    cand_len = f(cand_len)
    parent, char = f(parent), f(jnp.broadcast_to(c, (K, V)))

    # ---- merge equal prefixes: lexsort on (hash pair, length),
    # segment-LSE over equal keys
    order = jnp.lexsort((cand_len, cand_h2, cand_h1))
    h1s, h2s = cand_h1[order], cand_h2[order]
    lns = cand_len[order]
    bs, nbs = cand_b[order], cand_nb[order]
    first = jnp.concatenate([jnp.ones((1,), bool),
                             (h1s[1:] != h1s[:-1]) |
                             (h2s[1:] != h2s[:-1]) |
                             (lns[1:] != lns[:-1])])
    seg = jnp.cumsum(first) - 1                              # (N,)

    def seg_lse(x):
        mx = jax.ops.segment_max(x, seg, num_segments=N)
        mx = jnp.maximum(mx, NEG_INF)                        # empty segs
        s = jax.ops.segment_sum(jnp.exp(x - mx[seg]), seg,
                                num_segments=N)
        return jnp.maximum(mx + jnp.log(s + 1e-37), NEG_INF)

    m_b, m_nb = seg_lse(bs), seg_lse(nbs)
    rep = jnp.clip(jax.ops.segment_min(jnp.arange(N), seg,
                                       num_segments=N), 0, N - 1)
    score = _lse(m_b, m_nb)
    # segments past the last real one scored NEG_INF already
    top_score, top = jax.lax.top_k(score, K)

    par = parent[order][rep[top]]
    ch = char[order][rep[top]]
    ext = ch != blank
    plen = lens[par]
    wpos = jnp.clip(plen, 0, U - 1)
    upd = ext[:, None] & (jnp.arange(U)[None, :] == wpos[:, None])
    new_toks = jnp.where(upd, ch[:, None], toks[par])
    # emission timestamps: the frame at which each label first entered
    # the prefix (the host decoder's per-character time source)
    new_frames = jnp.where(upd, t, frames[par])
    new_lens = jnp.clip(plen + ext.astype(plen.dtype), 0, U)
    new_last = jnp.where(ext, ch, last[par])
    if fusion is not None:
        rolled = ctx[par] // fusion.C + ch * fusion.C ** (fusion.m - 1)
        new_ctx = jnp.where(ext, rolled, ctx[par])
    else:
        new_ctx = ctx[par]
    new_h1 = h1s[rep[top]]
    new_h2 = h2s[rep[top]]
    new_b = jnp.maximum(m_b[top], NEG_INF)
    new_nb = jnp.maximum(m_nb[top], NEG_INF)

    # lanes whose top-K slot landed on an empty segment (score still
    # NEG_INF) must not inherit a real candidate's hash/tokens through
    # the rep clip above — re-deaden them with unique junk hashes and
    # -1 tokens so they can neither merge with a live prefix nor show
    # up as a duplicate transcript in the returned beam
    dead = top_score <= NEG_INF * 0.5
    lane = jnp.arange(K, dtype=jnp.uint32)
    new_h1 = jnp.where(dead, jnp.uint32(0x60000000) + lane, new_h1)
    new_h2 = jnp.where(dead, jnp.uint32(0x70000000) + lane, new_h2)
    new_toks = jnp.where(dead[:, None], jnp.int32(-1), new_toks)
    new_frames = jnp.where(dead[:, None], jnp.int32(-1), new_frames)
    new_lens = jnp.where(dead, 0, new_lens)
    new_last = jnp.where(dead, -1, new_last)

    new_state = (new_toks, new_lens, new_last, new_h1, new_h2,
                 new_ctx, new_b, new_nb, new_frames)
    # frames past the utterance length are identity
    keep = lambda new, old: jnp.where(
        jnp.reshape(active, (1,) * new.ndim), new, old)
    state = tuple(keep(n, o) for n, o in zip(new_state, state))
    return state, None


def _init_single(K, U, fusion: Optional[FusionLM]):
    toks = jnp.full((K, U), -1, jnp.int32)
    lens = jnp.zeros((K,), jnp.int32)
    last = jnp.full((K,), -1, jnp.int32)
    # beam 0 = the empty prefix; other lanes start dead with junk
    # hashes so they can never merge with a real prefix
    k = jnp.arange(K, dtype=jnp.uint32)
    h1 = jnp.where(k == 0, jnp.uint32(1), jnp.uint32(0x40000000) + k)
    h2 = jnp.where(k == 0, jnp.uint32(2), jnp.uint32(0x50000000) + k)
    init_ctx = fusion.init_ctx if fusion is not None else 0
    ctx = jnp.full((K,), init_ctx, jnp.int32)
    p_b = jnp.where(k == 0, 0.0, NEG_INF).astype(jnp.float32)
    p_nb = jnp.full((K,), NEG_INF, jnp.float32)
    frames = jnp.full((K, U), -1, jnp.int32)
    return (toks, lens, last, h1, h2, ctx, p_b, p_nb, frames)


def _scan_single(state, logp, n_valid, t0=0, *, K, V, U,
                 fusion: Optional[FusionLM]):
    T = logp.shape[0]
    active = jnp.arange(T) < n_valid
    t = t0 + jnp.arange(T, dtype=jnp.int32)
    step = functools.partial(_beam_step, K=K, V=V, U=U, fusion=fusion)
    return jax.lax.scan(step, state, (logp, active, t))[0]


def _rank_single(state, K):
    toks, lens, frames = state[0], state[1], state[8]
    scores = _lse(state[6], state[7])
    top_scores, order = jax.lax.top_k(scores, K)
    return toks[order], lens[order], top_scores, frames[order]


def _beam_search_single(logp, length, *, K, V, U,
                        fusion: Optional[FusionLM]):
    state = _init_single(K, U, fusion)
    state = _scan_single(state, logp, length, K=K, V=V, U=U,
                         fusion=fusion)
    return _rank_single(state, K)


def ctc_beam_search_tpu(logits: jax.Array,
                        logit_lengths: jax.Array,
                        beam_width: int = 16,
                        max_label_len: Optional[int] = None,
                        fusion: Optional[FusionLM] = None,
                        return_frames: bool = False
                        ) -> Tuple[jax.Array, ...]:
    """Batched on-device CTC prefix beam search.

    Args:
      logits: (B, T, V) raw logits, blank = last class (repo/reference
        convention, `ops/ctc.py`).
      logit_lengths: (B,) valid frame counts.
      beam_width: K, static.
      max_label_len: U, static emit-length cap (default T). Prefixes
        that reach U stop growing (the last slot is overwritten) —
        choose U at least the longest expected transcript.
      fusion: optional :class:`FusionLM` for on-device shallow fusion.
      return_frames: also return per-label emission frame indices —
        the timestamp source the host ``BeamDecoder`` exposes as word
        timings (reference `decoders/ctc_beam_search_decoder.cpp`).

    Returns ``(ids, lengths, scores)``: (B, K, U) label ids padded with
    -1, (B, K) lengths, (B, K) total log probabilities (LM-fused when
    ``fusion`` is given), best beam first. With ``return_frames`` a
    fourth (B, K, U) int32 array gives the frame at which each label
    entered the prefix (-1 past the length).
    """
    B, T, V = logits.shape
    U = int(max_label_len or T)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    run = functools.partial(_beam_search_single, K=int(beam_width),
                            V=V, U=U, fusion=fusion)
    ids, lens, scores, frames = jax.vmap(run)(logp, logit_lengths)
    if return_frames:
        return ids, lens, scores, frames
    return ids, lens, scores


# ---------------------------------------------------------------------
# Streaming (chunked) API: carry the beam across chunks under jit —
# the on-device analogue of the stateful host `BeamDecoder`
# (`ops/ctc_beam_native.py`) that `apps/frame_asr.py` drives. Feeding
# an utterance chunk-by-chunk yields bit-identical beams to one-shot
# decoding (`tests/test_ctc_beam_tpu.py::test_streaming_chunks_match`).

def ctc_beam_init(batch_size: int, beam_width: int, max_label_len: int,
                  fusion: Optional[FusionLM] = None):
    """Fresh batched beam state: the empty prefix in lane 0. The last
    element is the per-utterance global frame counter, so streamed
    emission timestamps are utterance-absolute."""
    one = _init_single(int(beam_width), int(max_label_len), fusion)
    core = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch_size,) + x.shape),
        one)
    return core + (jnp.zeros((batch_size,), jnp.int32),)


def ctc_beam_update(state, logits: jax.Array, chunk_lengths: jax.Array,
                    fusion: Optional[FusionLM] = None):
    """Advance the beam by one (B, Tc, V) logits chunk.

    ``chunk_lengths`` (B,) marks valid frames in this chunk (ragged
    tails supported). Returns ``(new_state, (ids, lens, scores,
    frames))`` with the current-best decode ranked best-first —
    callable after every chunk for partial transcripts; ``frames``
    carries utterance-absolute emission frame indices.
    """
    B, Tc, V = logits.shape
    K, U = state[0].shape[1], state[0].shape[2]
    core, t_done = state[:-1], state[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    scan = functools.partial(_scan_single, K=K, V=V, U=U, fusion=fusion)
    core = jax.vmap(scan)(core, logp, chunk_lengths, t_done)
    ids, lens, scores, frames = jax.vmap(
        functools.partial(_rank_single, K=K))(core)
    state = core + (t_done + chunk_lengths.astype(jnp.int32),)
    return state, (ids, lens, scores, frames)
