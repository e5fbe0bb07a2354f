import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openseq2seq_tpu.ops.beam_search import (beam_search,
                                             sequence_lengths_from_ids)


def _static_logits_fn(logit_table):
    """Deterministic next-token logits depending only on position."""
    def fn(ids, pos, cache):
        B = ids.shape[0]
        logits = jnp.broadcast_to(logit_table[pos], (B, logit_table.shape[1]))
        return logits, cache
    return fn


def test_greedy_decodes_argmax_path():
    V, T, eos = 5, 4, 1
    table = np.full((T, V), -5.0, np.float32)
    path = [4, 3, 2, eos]
    for t, k in enumerate(path):
        table[t, k] = 5.0
    ids, scores = beam_search(_static_logits_fn(jnp.asarray(table)),
                              init_cache={}, batch_size=2, beam_size=1,
                              vocab_size=V, max_decode_length=T, eos_id=eos,
                              alpha=0.0)
    out = np.asarray(ids)[:, 0, 1:]
    assert out[0].tolist()[:4] == path
    assert out[1].tolist()[:4] == path


def test_beam_finds_higher_prob_delayed_path():
    """Greedy takes token A at step 0 but the globally better sequence
    starts with B — beam >= 2 must find it."""
    V, eos = 4, 1
    # step 0: A(id 2) logp ~ log(0.55), B(id 3) ~ log(0.45)
    # after A: must continue with low-prob tokens; after B: eos with p~1
    def fn(ids, pos, cache):
        tok = ids[:, 0]
        logits_after_a = jnp.asarray([-10.0, 0.0, 0.0, -10.0])  # uncertain
        logits_after_b = jnp.asarray([-10.0, 10.0, -10.0, -10.0])  # eos
        step0 = jnp.asarray([-10.0, -10.0, np.log(0.55) * 2,
                             np.log(0.45) * 2])
        logits = jnp.where(
            (pos == 0), step0[None, :],
            jnp.where((tok == 2)[:, None], logits_after_a[None, :],
                      logits_after_b[None, :]))
        return jnp.broadcast_to(logits, (ids.shape[0], V)), cache

    ids, scores = beam_search(fn, init_cache={}, batch_size=1, beam_size=3,
                              vocab_size=V, max_decode_length=6, eos_id=eos,
                              alpha=0.0)
    best = np.asarray(ids)[0, 0, 1:]
    # best path: B (3) then EOS
    assert best[0] == 3
    assert best[1] == eos


def test_beam_search_cache_is_gathered():
    """Cache entries must follow their beams: make logits depend on a
    cache value written at step 0."""
    V, eos = 4, 1

    def fn(ids, pos, cache):
        marker = cache["m"]
        # write the chosen token at step 0 into the cache marker
        new_marker = jnp.where(pos == 0, ids[:, 0].astype(jnp.float32),
                               marker)
        # tokens !=  marker are discouraged from step 1 on
        base = jnp.zeros((ids.shape[0], V))
        favored = new_marker.astype(jnp.int32)
        bonus = jax.nn.one_hot(favored, V) * 3.0
        eos_bias = jnp.zeros((V,)).at[eos].set(1.0)
        logits = jnp.where(pos >= 2, base + eos_bias[None, :] * 10,
                           base + bonus)
        return logits, {"m": new_marker}

    ids, _ = beam_search(fn, init_cache={"m": jnp.zeros((2,))},
                         batch_size=2, beam_size=2, vocab_size=V,
                         max_decode_length=5, eos_id=eos, alpha=0.0)
    seq = np.asarray(ids)[0, 0, 1:]
    # consistency: step-1 token equals step-0 token (cache followed beam)
    assert seq[1] == seq[0]


def test_sequence_lengths_from_ids():
    ids = jnp.asarray([[4, 3, 1, 0, 0],
                       [4, 3, 2, 5, 6]])
    lens = sequence_lengths_from_ids(ids, eos_id=1)
    assert np.asarray(lens).tolist() == [3, 5]


def test_length_penalty_prefers_longer_with_high_alpha():
    """With alpha > 0 longer sequences are penalized less."""
    from openseq2seq_tpu.ops.beam_search import _length_penalty
    assert float(_length_penalty(1.0, 10)) > float(_length_penalty(1.0, 2))
    assert float(_length_penalty(0.0, 10)) == pytest.approx(1.0)


def test_topk_grouped_matches_lax_topk():
    """The grouped exact top-k (sort-avoiding path, V > 2048) must
    agree with lax.top_k in values and pick valid indices."""
    import jax
    import jax.numpy as jnp
    from openseq2seq_tpu.ops.beam_search import _topk_grouped
    rng = np.random.RandomState(0)
    for shape, k in [((4, 3, 32768), 8), ((2, 5000), 6),
                     ((3, 2, 2049), 4)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = _topk_grouped(x, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        # indices must address the same values (ties may reorder)
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(x), np.asarray(i2), -1),
            np.asarray(v1))
    # tiny-axis fallback path
    x = jnp.asarray(rng.randn(2, 7, 30).astype(np.float32))
    v1, i1 = jax.lax.top_k(x, 6)
    v2, i2 = _topk_grouped(x, 6)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_static_cache_merges_and_stays_out_of_carry():
    """static_cache entries must be visible to the step fn (beam-tiled
    to B*K), never be gathered/carried, and shadowing must fail fast."""
    V, T, eos, B, K = 5, 3, 1, 2, 2
    table = np.full((T, V), -5.0, np.float32)
    for t, k in enumerate([4, 3, eos]):
        table[t, k] = 5.0
    seen = {}

    jtable = jnp.asarray(table)

    def fn(ids, pos, cache):
        # dynamic entry: a per-beam step counter that must be carried
        # static entry: must be present, beam-flattened to (B*K, 1)
        seen["static_shape"] = cache["enc"].shape
        logits = jnp.broadcast_to(jtable[pos], (ids.shape[0], V))
        logits = logits + 0.0 * cache["enc"][:, 0, None]
        return logits, {"count": cache["count"] + 1, "enc": cache["enc"]}

    ids, _ = beam_search(
        fn, init_cache={"count": jnp.zeros((B, 1))},
        batch_size=B, beam_size=K, vocab_size=V, max_decode_length=T,
        eos_id=eos, alpha=0.0,
        static_cache={"enc": jnp.ones((B, 1))})
    assert seen["static_shape"] == (B * K, 1)
    assert np.asarray(ids)[0, 0, 1:].tolist() == [4, 3, eos]

    with pytest.raises(ValueError, match="static_cache keys"):
        beam_search(fn, init_cache={"enc": jnp.zeros((B, 1))},
                    batch_size=B, beam_size=K, vocab_size=V,
                    max_decode_length=T, eos_id=eos,
                    static_cache={"enc": jnp.ones((B, 1))})


def test_lazy_cache_rows_stay_put_and_ancestry_resolves():
    """lazy_cache=True: the dynamic cache must NOT be gathered on beam
    reorders; instead the step fn receives ``beam_ancestry`` and
    resolves history through it. Port of the cache-gather test: logits
    favor the token this beam wrote at step 0 — but here each slot's
    write stays in its own row, so consistency (step-1 token == step-0
    token) holds only if ancestry resolution works."""
    V, eos, B, K, T = 4, 1, 2, 2, 5

    def fn(ids, pos, cache):
        anc = cache["beam_ancestry"]                      # (B*K, T+1)
        toks = cache["toks"]                              # (B*K, T)
        BK = ids.shape[0]
        row = jnp.arange(BK)
        new_toks = toks.at[row, pos].set(ids[:, 0].astype(jnp.float32))
        # my step-0 token lives in row (b*K + anc[:, 0]) — NOT my row
        owner = (row // K) * K + anc[:, 0]
        favored = new_toks[owner, 0].astype(jnp.int32)
        bonus = jax.nn.one_hot(favored, V) * 3.0
        eos_bias = jnp.zeros((V,)).at[eos].set(1.0)
        logits = jnp.where(pos >= 2,
                           eos_bias[None, :] * 10.0,
                           bonus)
        return logits, {"toks": new_toks}

    ids, _ = beam_search(fn, init_cache={"toks": jnp.zeros((B, 5))},
                         batch_size=B, beam_size=K, vocab_size=V,
                         max_decode_length=T, eos_id=eos, alpha=0.0,
                         lazy_cache=True)
    arr = np.asarray(ids)
    for b in range(B):
        seq = arr[b, 0, 1:]
        assert seq[1] == seq[0]


def test_lazy_beam_decode_matches_eager(tmp_path):
    """Transformer incremental decode: lazy (ancestry) and eager
    (gathered-cache) beam search must produce identical beams."""
    import jax
    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.test_utils import toy_nmt

    data = toy_nmt.generate(str(tmp_path))
    outs = {}
    for lazy in (True, False):
        cfg = toy_nmt.transformer_toy_config(data, mode_files="eval",
                                             num_epochs=1)
        cfg["decoder_params"]["lazy_decode"] = lazy
        cfg["data_layer_params"]["shuffle"] = False
        model = Text2Text(params=cfg, mode="eval")
        batch = next(iter(model.get_data_layer().iterate_one_epoch()))
        state = model.init_state(batch)
        db = jax.tree_util.tree_map(np.asarray, batch)
        out = jax.device_get(jax.jit(model.eval_step)(state, db))
        outs[lazy] = out["outputs"]["decoder_output"]
    np.testing.assert_array_equal(outs[True]["beams"],
                                  outs[False]["beams"])
    np.testing.assert_allclose(outs[True]["scores"],
                               outs[False]["scores"], rtol=1e-4)


def test_packed_decode_cache_matches_per_layer(tmp_path):
    """The packed all-layer lane-full KV buffer and the per-layer
    {k,v}-list layout are storage layouts of the same schedule — beams
    and scores must be identical."""
    import jax
    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.test_utils import toy_nmt

    data = toy_nmt.generate(str(tmp_path))
    outs = {}
    for layout in ("packed", "per_layer"):
        cfg = toy_nmt.transformer_toy_config(data, mode_files="eval",
                                             num_epochs=1)
        cfg["decoder_params"]["decode_cache"] = layout
        cfg["data_layer_params"]["shuffle"] = False
        model = Text2Text(params=cfg, mode="eval")
        batch = next(iter(model.get_data_layer().iterate_one_epoch()))
        state = model.init_state(batch)
        db = jax.tree_util.tree_map(np.asarray, batch)
        out = jax.device_get(jax.jit(model.eval_step)(state, db))
        outs[layout] = out["outputs"]["decoder_output"]
    np.testing.assert_array_equal(outs["packed"]["beams"],
                                  outs["per_layer"]["beams"])
    np.testing.assert_allclose(outs["packed"]["scores"],
                               outs["per_layer"]["scores"], rtol=1e-4)


def test_segmented_decode_matches_unsegmented(tmp_path):
    """Prefix-bounded segmented decode (`decode_segments`) is pure
    traffic shaping: beams and scores must be identical to the
    single-loop schedule, for both cache layouts."""
    import jax
    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.test_utils import toy_nmt

    data = toy_nmt.generate(str(tmp_path))
    for layout in ("packed", "per_layer"):
        outs = {}
        for segs in (1, 3):
            cfg = toy_nmt.transformer_toy_config(data, mode_files="eval",
                                                 num_epochs=1)
            cfg["decoder_params"]["decode_cache"] = layout
            cfg["decoder_params"]["decode_segments"] = segs
            cfg["data_layer_params"]["shuffle"] = False
            model = Text2Text(params=cfg, mode="eval")
            batch = next(iter(model.get_data_layer().iterate_one_epoch()))
            state = model.init_state(batch)
            db = jax.tree_util.tree_map(np.asarray, batch)
            out = jax.device_get(jax.jit(model.eval_step)(state, db))
            outs[segs] = out["outputs"]["decoder_output"]
        np.testing.assert_array_equal(outs[1]["beams"], outs[3]["beams"])
        np.testing.assert_allclose(outs[1]["scores"], outs[3]["scores"],
                                   rtol=1e-4)


def test_geometric_segment_bounds():
    from openseq2seq_tpu.ops.beam_search import geometric_segment_bounds
    assert geometric_segment_bounds(114, 3) == [32, 64]
    assert geometric_segment_bounds(114, 1) == []
    assert geometric_segment_bounds(16, 4) == [8]  # dedup/clip < T
    assert all(b % 8 == 0 for b in geometric_segment_bounds(1000, 4))
