"""Batched beam search, fully jittable.

The reference's ``SequenceBeamSearch`` alive/finished state machine
(`open_seq2seq/parts/transformer/beam_search.py:29-541`) rebuilt as a
pure function around ``lax.while_loop``:

  * static shapes throughout — sequence buffers are (B, K, T_max) and
    the KV cache (B*K, ...) is threaded through the loop state (the
    reference needed TF shape-invariant hacks, `beam_search.py:73-95`);
  * length-normalized scores ((5+len)/6)^alpha (GNMT length penalty);
  * early termination when the best possible alive score cannot beat
    the worst finished score;
  * beam_size=1 degenerates to greedy decoding (used for fast eval).

``symbols_to_logits_fn(ids, pos, cache) -> (logits, new_cache)`` runs
one decoder step on flattened (B*K, 1) ids.

TPU memory-traffic design (the per-step cost is HBM bandwidth on the
KV cache, not FLOPs):

  * beam-INVARIANT tensors (encoder memory, cross-attention KV,
    padding masks) go in ``static_cache`` — they are broadcast to
    (B*K, ...) once, merged into the dict ``symbols_to_logits_fn``
    sees, and never re-gathered in the loop (gathering them is a
    semantic no-op: every beam holds an identical copy);
  * the dynamic cache is gathered ONCE per step with composed
    alive-beam indices (grow-2K then select-K is done on indices, not
    by materializing a 2K-wide cache);
  * with ``lazy_cache=True`` the per-step cache gather disappears
    entirely: cache rows stay physically fixed and a tiny (B, K, T)
    int32 ancestry matrix records, for each live beam, which slot's
    row holds its KV at every past position. The step fn sees it as
    ``cache["beam_ancestry"]`` (flattened (B*K, T)) and resolves
    history inside attention (attend over all K slots, select by
    ancestry — K x more MXU FLOPs, which a bandwidth-bound decode has
    to spare, for ~3x less HBM cache traffic);
  * the top-2K search runs per-beam over V first, then over the K*2K
    survivors — mathematically exact (any global top-2K candidate is
    in its own beam's top-2K) and avoids reshaping a (B, K*V) buffer.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


def _length_penalty(alpha: float, length) -> jnp.ndarray:
    return jnp.power((5.0 + jnp.asarray(length, jnp.float32)) / 6.0, alpha)


def _flatten_beam(x):
    B, K = x.shape[:2]
    return x.reshape((B * K,) + x.shape[2:])


def _unflatten_beam(x, B, K):
    return x.reshape((B, K) + x.shape[1:])


def _gather_beams(tree, indices):
    """Select beams along axis 1: tree leaves (B, K_old, ...), indices
    (B, K_new) -> leaves (B, K_new, ...)."""
    def gather(x):
        if x.shape[1] == 1 and indices.shape[1] == 1:
            # greedy decoding: the only index is 0 — skip the gather
            # (the KV caches are the dominant per-step HBM traffic)
            return x
        return jax.vmap(lambda row, idx: jnp.take(row, idx, axis=0))(
            x, indices)
    return jax.tree_util.tree_map(gather, tree)


_GROUP = 128          # one TPU lane row per group


def _topk_grouped(x, k):
    """Exact top-k over the last axis, avoiding XLA's full-sort
    lowering of ``lax.top_k`` on large axes (profiled at 11.8 ms/step
    for (B, K, 32768) fp32 — 35% of a transformer-big decode step).

    Two-level prune: partition the axis into 128-wide groups, rank
    groups by their max, and search only the top-k groups. Any global
    top-k element must lie in one of them — if k groups each had a max
    above element x, they would hold k elements ranked above x. The
    full sort over V becomes a top-k over V/128 group-maxes plus one
    over k*128 candidates.
    """
    V = x.shape[-1]
    G = -(-V // _GROUP)
    if k >= G or V <= 2048:          # tiny axes: plain top_k is fine
        return jax.lax.top_k(x, k)
    Vp = G * _GROUP
    if Vp != V:
        # pad with the dtype's finite min, NOT -inf: the candidate
        # rows are pulled with a one-hot matmul below and 0 * -inf
        # would poison it with NaNs (finite min never wins a top-k
        # over any real logit, so the result is unchanged)
        pad = jnp.full(x.shape[:-1] + (Vp - V,),
                       jnp.finfo(x.dtype).min, x.dtype)
        x = jnp.concatenate([x, pad], axis=-1)
    xg = x.reshape(x.shape[:-1] + (G, _GROUP))
    gmax = jnp.max(xg, axis=-1)                          # (..., G)
    _, gidx = jax.lax.top_k(gmax, k)                     # (..., k)
    # pull the k winning rows with a one-hot matmul: exact (each output
    # element is 1.0 * x + zeros), and it rides the MXU. The obvious
    # jnp.take_along_axis with indices .repeat(GROUP) was the single
    # most expensive op of a profiled transformer-big decode step
    # (3.2 ms for a 6 MB operand — XLA lowers the element-wise index
    # form to a serialized scalar gather on TPU).
    onehot = (gidx[..., None] ==
              jnp.arange(G, dtype=gidx.dtype)).astype(x.dtype)
    cand = jnp.einsum("...kg,...gc->...kc", onehot, xg,
                      preferred_element_type=x.dtype)     # (..., k, 128)
    flat = cand.reshape(cand.shape[:-2] + (k * _GROUP,))
    top_v, flat_idx = jax.lax.top_k(flat, k)
    group_of = jnp.take_along_axis(gidx, flat_idx // _GROUP, axis=-1)
    return top_v, group_of * _GROUP + flat_idx % _GROUP


def geometric_segment_bounds(max_decode_length: int, num_segments: int,
                             multiple: int = 8):
    """A halving ladder of cache bounds for segmented decode:
    ``num_segments=3``, T=114 → [32, 64] (the final implicit bound is
    always T). Bounds are rounded up to ``multiple`` so the sliced
    cache keeps sublane-aligned time rows."""
    bounds = []
    for s in range(1, num_segments):
        b = -(-max_decode_length // (2 ** (num_segments - s)))
        b = -(-b // multiple) * multiple
        if b < max_decode_length and b not in bounds:
            bounds.append(b)
    return bounds


def beam_search(symbols_to_logits_fn: Callable,
                init_cache: Any,
                batch_size: int,
                beam_size: int,
                vocab_size: int,
                max_decode_length: int,
                eos_id: int,
                alpha: float = 0.6,
                bos_id: int = 0,
                static_cache: Optional[dict] = None,
                lazy_cache: bool = False,
                segment_bounds: Optional[Sequence[int]] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (decoded_ids (B, K, T_max+1), scores (B, K)), best first.

    decoded_ids[:, :, 0] is ``bos_id``; tokens from position 1.

    ``static_cache``: dict of beam-invariant (B, ...) tensors. They are
    beam-tiled once and merged into the cache dict the step fn sees
    (requires ``init_cache`` to be a dict); whatever the step fn
    returns under those keys is dropped — they never enter the loop
    carry or the per-step beam gathers.

    ``lazy_cache``: never gather the dynamic cache on beam reorders;
    instead maintain an ancestry matrix the step fn receives as
    ``cache["beam_ancestry"]`` ((B*K, T) int32 — row bk, column t
    names the beam slot whose cache row holds this beam's state for
    position t). Requires a step fn whose attention resolves ancestry
    (see ``parts/transformer/attention.SelfAttention``); the cache it
    returns under ``beam_ancestry`` is ignored.

    ``segment_bounds``: prefix-bounded segmented decode. Per-step KV
    cache traffic (the dominant decode cost) is proportional to the
    cache's TIME capacity, but the unsegmented loop always reads the
    full (·, T, ·) buffer even at step 3. With bounds ``[32, 64]``
    (say, T=114) the search runs as THREE chained while_loops whose
    carried cache is time-sliced to 32 / 64 / 114 rows, zero-padded up
    between segments — steps < 32 touch a 32-row cache, etc. Exact:
    positions ≥ the bound are causally masked anyway, so this is pure
    traffic shaping (identical beams). Requires every ``init_cache``
    leaf to carry the time axis at dim 1 (both the packed
    (B, T, 2·L·D) and per-layer (B, T, h, dh) layouts do) and is
    mutually exclusive with ``lazy_cache`` (whose ancestry matrix is
    already tiny). Compile cost: one program per segment.
    """
    B, K, V, T = batch_size, beam_size, vocab_size, max_decode_length
    if lazy_cache and K == 1:
        lazy_cache = False      # greedy already skips every gather
    bounds = [T]
    if segment_bounds:
        if lazy_cache:
            raise ValueError("segment_bounds and lazy_cache are "
                             "mutually exclusive")
        bounds = sorted({int(b) for b in segment_bounds
                         if 0 < int(b) < T}) + [T]

    # replicate the cache over K beams: leaves (B, ...) -> (B, K, ...)
    tile = lambda x: jnp.broadcast_to(  # noqa: E731
        x[:, None], (B, K) + x.shape[1:])
    cache = jax.tree_util.tree_map(tile, init_cache)
    static_keys = ()
    flat_static = {}
    if static_cache:
        overlap = set(static_cache) & set(init_cache)
        if overlap:
            raise ValueError(
                "static_cache keys {} also present in init_cache — a "
                "static entry would shadow the carried state".format(
                    sorted(overlap)))
        static_keys = tuple(static_cache.keys())
        # materialized (B*K, ...) once, outside the loop
        flat_static = jax.tree_util.tree_map(
            lambda x: _flatten_beam(tile(x)), dict(static_cache))

    seq = jnp.full((B, K, T + 1), bos_id, jnp.int32)
    # only beam 0 is alive at step 0 (others would duplicate it)
    alive_log_probs = jnp.tile(
        jnp.array([[0.0] + [NEG_INF] * (K - 1)], jnp.float32), (B, 1))
    finished_seq = jnp.zeros((B, K, T + 1), jnp.int32)
    finished_scores = jnp.full((B, K), NEG_INF, jnp.float32)
    finished_flags = jnp.zeros((B, K), jnp.bool_)
    # ancestry starts as identity: every slot's history is its own row
    # (all rows hold identical copies of the initial state)
    anc_identity = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, T))
    ancestry = anc_identity if lazy_cache else jnp.zeros((0,), jnp.int32)

    def make_condition(bound):
        def condition(state):
            i, seq, alive_lp, cache, ancestry, fin_seq, fin_scores, \
                fin_flags = state
            max_lp = _length_penalty(alpha, T)
            best_alive = alive_lp[:, 0] / max_lp
            worst_finished = jnp.min(
                jnp.where(fin_flags, fin_scores, NEG_INF), axis=1)
            worst_finished = jnp.where(jnp.any(fin_flags, axis=1),
                                       worst_finished, NEG_INF)
            still_improving = jnp.any(best_alive > worst_finished)
            return jnp.logical_and(i < bound, still_improving)
        return condition

    def body(state):
        i, seq, alive_lp, cache, ancestry, fin_seq, fin_scores, \
            fin_flags = state

        # ---- one decoder step on the current token of each alive beam
        ids = jax.lax.dynamic_slice_in_dim(seq, i, 1, axis=2)     # (B,K,1)
        flat_cache = jax.tree_util.tree_map(_flatten_beam, cache)
        if static_keys:
            flat_cache = {**flat_cache, **flat_static}
        if lazy_cache:
            flat_cache["beam_ancestry"] = _flatten_beam(ancestry)
        logits, flat_new_cache = symbols_to_logits_fn(
            _flatten_beam(ids), i, flat_cache)                    # (B*K, V)
        flat_new_cache = dict(flat_new_cache)
        flat_new_cache.pop("beam_ancestry", None)
        if static_keys:
            flat_new_cache = {k: v for k, v in flat_new_cache.items()
                              if k not in static_keys}
        new_cache = jax.tree_util.tree_map(
            lambda x: _unflatten_beam(x, B, K), flat_new_cache)
        raw = _unflatten_beam(logits.astype(jnp.float32), B, K)   # (B,K,V)

        # ---- grow alive: exact two-stage top-2K (per-beam over V,
        # then over the K*kb survivors). kb < 2K only for toy vocabs.
        # Stage 1 searches the RAW logits — log_softmax and the alive
        # log-prob are per-(b,k)-row additive shifts, so the per-beam
        # top-k is unchanged and the full (B, K, V) fp32 log-prob
        # tensor never materializes; only the kb survivors get the
        # exact normalized scores.
        kb = min(2 * K, V)
        lp_raw, idx_pb = _topk_grouped(raw, kb)                   # (B,K,kb)
        lse = jax.scipy.special.logsumexp(raw, axis=-1)           # (B,K)
        lp_pb = lp_raw + (alive_lp - lse)[:, :, None]
        top_lp, sel = jax.lax.top_k(lp_pb.reshape(B, K * kb),
                                    min(2 * K, K * kb))           # (B,2K)
        beam_idx = sel // kb
        token_idx = jnp.take_along_axis(
            idx_pb.reshape(B, K * kb), sel, axis=1)

        top_seq = _gather_beams(seq, beam_idx)                    # (B,2K,T+1)
        top_seq = jax.vmap(jax.vmap(
            lambda s, t: jax.lax.dynamic_update_index_in_dim(
                s, t, i + 1, axis=0)))(top_seq, token_idx)
        is_eos = (token_idx == eos_id)

        # alive: best K non-EOS continuations; the cache is gathered
        # ONCE with composed indices (never materialized at 2K width)
        alive_cand = jnp.where(is_eos, NEG_INF, top_lp)
        new_alive_lp, alive_sel = jax.lax.top_k(alive_cand, K)
        new_seq = _gather_beams(top_seq, alive_sel)
        alive_beam_idx = jnp.take_along_axis(beam_idx, alive_sel,
                                             axis=1)             # (B,K)
        if lazy_cache:
            # rows stay put; only the ancestry matrix reorders. Columns
            # < i inherit the parent's history, column i records which
            # row the parent wrote this step's KV into, columns > i
            # reset to identity (each slot writes its own future rows).
            tpos = jnp.arange(T)[None, None, :]
            ganc = _gather_beams(ancestry, alive_beam_idx)
            new_ancestry = jnp.where(
                tpos < i, ganc,
                jnp.where(tpos == i, alive_beam_idx[:, :, None],
                          anc_identity))
        else:
            new_ancestry = ancestry
            new_cache = _gather_beams(new_cache, alive_beam_idx)

        # finished: merge EOS candidates with existing finished set
        cand_scores = top_lp / _length_penalty(alpha, i + 1)
        cand_scores = jnp.where(is_eos, cand_scores, NEG_INF)
        all_seq = jnp.concatenate([fin_seq, top_seq], axis=1)     # (B,3K,·)
        all_scores = jnp.concatenate([fin_scores, cand_scores], axis=1)
        all_flags = jnp.concatenate([fin_flags, is_eos], axis=1)
        new_fin_scores, fin_sel = jax.lax.top_k(all_scores, K)
        new_fin_seq = _gather_beams(all_seq, fin_sel)
        new_fin_flags = _gather_beams(all_flags, fin_sel)

        return (i + 1, new_seq, new_alive_lp, new_cache, new_ancestry,
                new_fin_seq, new_fin_scores, new_fin_flags)

    if len(bounds) > 1:
        # segmented: start with the cache time axis (dim 2 after beam
        # tiling) sliced to the first bound; grow between segments
        cache = jax.tree_util.tree_map(
            lambda x: jax.lax.slice_in_dim(x, 0, bounds[0], axis=2),
            cache)
    state = (jnp.int32(0), seq, alive_log_probs, cache, ancestry,
             finished_seq, finished_scores, finished_flags)
    prev_bound = 0
    for bound in bounds:
        if prev_bound:
            pad = bound - prev_bound
            (i, seq, alive_lp, cache, ancestry, fin_seq, fin_scores,
             fin_flags) = state
            cache = jax.tree_util.tree_map(
                lambda x: jnp.pad(
                    x, [(0, 0), (0, 0), (0, pad)] +
                    [(0, 0)] * (x.ndim - 3)), cache)
            state = (i, seq, alive_lp, cache, ancestry, fin_seq,
                     fin_scores, fin_flags)
        state = jax.lax.while_loop(make_condition(bound), body, state)
        prev_bound = bound
    (_, seq, alive_lp, _, _, fin_seq, fin_scores, fin_flags) = state

    # fall back to alive beams for rows with nothing finished
    any_finished = jnp.any(fin_flags, axis=1)
    alive_scores = alive_lp / _length_penalty(alpha, T)
    out_seq = jnp.where(any_finished[:, None, None], fin_seq, seq)
    out_scores = jnp.where(any_finished[:, None], fin_scores, alive_scores)
    return out_seq, out_scores


def sequence_lengths_from_ids(ids: jnp.ndarray, eos_id: int) -> jnp.ndarray:
    """Length up to and including the first EOS (ids without BOS)."""
    is_eos = (ids == eos_id)
    seen = jnp.cumsum(is_eos.astype(jnp.int32), axis=-1)
    return jnp.sum((seen == 0).astype(jnp.int32), axis=-1) + \
        jnp.any(is_eos, axis=-1).astype(jnp.int32)
