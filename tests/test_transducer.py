"""Transducer (RNN-T) tests: loss vs a numpy DP oracle, gradient
finite-difference check, greedy decode vs a numpy oracle over the same
parameters, and end-to-end Conformer-Transducer convergence on toy data
(the reference's convergence-test pattern, SURVEY §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.decoders.transducer_decoder import (
    TransducerDecoderModule)
from openseq2seq_tpu.models import Speech2Text
from openseq2seq_tpu.ops.transducer import transducer_loss
from openseq2seq_tpu.training import trainer
from openseq2seq_tpu.utils.params import nested_update


def _log_softmax_np(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def _oracle_loss(logits, logit_lens, labels, label_lens, blank):
    """Direct (t, u) lattice DP in numpy."""
    B = logits.shape[0]
    lp = _log_softmax_np(logits.astype(np.float64))
    out = np.zeros(B)
    for b in range(B):
        Tb, Ub = int(logit_lens[b]), int(label_lens[b])
        alpha = np.full((Tb, Ub + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(Tb):
            for u in range(Ub + 1):
                if t == 0 and u == 0:
                    continue
                via_blank = (alpha[t - 1, u] + lp[b, t - 1, u, blank]
                             if t > 0 else -np.inf)
                via_label = (alpha[t, u - 1] +
                             lp[b, t, u - 1, labels[b, u - 1]]
                             if u > 0 else -np.inf)
                alpha[t, u] = np.logaddexp(via_blank, via_label)
        out[b] = -(alpha[Tb - 1, Ub] + lp[b, Tb - 1, Ub, blank])
    return out


def test_loss_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    B, T, U, V = 4, 7, 5, 6
    logits = rng.randn(B, T, U + 1, V).astype(np.float32) * 2.0
    labels = rng.randint(0, V - 1, (B, U)).astype(np.int32)
    logit_lens = np.array([7, 5, 1, 6], np.int32)
    label_lens = np.array([5, 3, 2, 0], np.int32)   # incl. U>T and U=0
    got = np.asarray(transducer_loss(
        jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), average_across_batch=False))
    want = _oracle_loss(logits, logit_lens, labels, label_lens, V - 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_loss_label_longer_than_frames():
    """U > T is feasible for the transducer (several labels per frame);
    the loss must be finite and match the oracle."""
    rng = np.random.RandomState(1)
    B, T, U, V = 2, 3, 8, 5
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(0, V - 1, (B, U)).astype(np.int32)
    logit_lens = np.array([3, 2], np.int32)
    label_lens = np.array([8, 6], np.int32)
    got = np.asarray(transducer_loss(
        jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), average_across_batch=False))
    want = _oracle_loss(logits, logit_lens, labels, label_lens, V - 1)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_loss_gradient_finite_difference():
    rng = np.random.RandomState(2)
    T, U, V = 4, 2, 4
    logits = rng.randn(1, T, U + 1, V).astype(np.float32)
    labels = np.array([[1, 2]], np.int32)
    ll = np.array([T], np.int32)
    ul = np.array([U], np.int32)

    def f(x):
        return transducer_loss(x, jnp.asarray(ll), jnp.asarray(labels),
                               jnp.asarray(ul))

    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    eps = 1e-3
    for idx in [(0, 0, 0, 1), (0, 2, 1, 3), (0, 3, 2, 0)]:
        p = logits.copy()
        p[idx] += eps
        m = logits.copy()
        m[idx] -= eps
        fd = (float(f(jnp.asarray(p))) - float(f(jnp.asarray(m)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=2e-4)


@pytest.mark.parametrize("block_size", [1, 3, 8, 16])
def test_fused_loss_matches_unfused(block_size):
    """The diagonal-fused loss (joint evaluated inside the blocked
    wavefront scan, no materialized lattice) must match the
    dense-lattice loss in value AND gradients (same math, reassociated)
    — for block sizes that divide D-1, leave a partial trailing block,
    and exceed D entirely (D = T+U = 10 here)."""
    rng = np.random.RandomState(4)
    B, T, U, J, V = 3, 6, 4, 5, 7
    enc_j = rng.randn(B, T, J).astype(np.float32)
    pred_j = rng.randn(B, U + 1, J).astype(np.float32)
    joint_b = rng.randn(J).astype(np.float32) * 0.1
    out_w = rng.randn(J, V).astype(np.float32)
    out_b = rng.randn(V).astype(np.float32) * 0.1
    labels = rng.randint(0, V - 1, (B, U)).astype(np.int32)
    logit_lens = np.array([6, 4, 2], np.int32)
    label_lens = np.array([4, 2, 3], np.int32)
    args = (jnp.asarray(logit_lens), jnp.asarray(labels),
            jnp.asarray(label_lens))

    def dense(enc_j, pred_j, joint_b, out_w, out_b):
        h = jnp.tanh(enc_j[:, :, None, :] + pred_j[:, None, :, :] +
                     joint_b)
        logits = h @ out_w + out_b
        return transducer_loss(logits, *args)

    def fused(enc_j, pred_j, joint_b, out_w, out_b):
        from openseq2seq_tpu.ops.transducer import transducer_loss_fused
        return transducer_loss_fused(enc_j, pred_j, joint_b, out_w,
                                     out_b, *args,
                                     block_size=block_size)

    inputs = tuple(jnp.asarray(a) for a in
                   (enc_j, pred_j, joint_b, out_w, out_b))
    v_dense, g_dense = jax.value_and_grad(dense, argnums=(0, 1, 3))(
        *inputs)
    v_fused, g_fused = jax.value_and_grad(fused, argnums=(0, 1, 3))(
        *inputs)
    np.testing.assert_allclose(float(v_fused), float(v_dense), rtol=1e-5)
    for gf, gd in zip(g_fused, g_dense):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=1e-4, atol=1e-5)


def test_fused_loss_single_train_step(toy_speech_data):
    """Full model single step with decoder_params.fused_loss=True; the
    loss must match the unfused configuration bit-for-bit at init (same
    params tree, same batch)."""
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        transducer_test_config)
    losses = {}
    for fused in (False, True):
        base_params, _ = transducer_test_config(
            toy_speech_data["csv"], toy_speech_data["vocab"],
            num_epochs=1)
        base_params["decoder_params"]["fused_loss"] = fused
        model = Speech2Text(params=base_params, mode="train")
        dl = model.get_data_layer()
        batch = next(iter(dl.iterate_one_epoch()))
        state = model.init_state(batch)
        device_batch = jax.tree_util.tree_map(np.asarray, batch)
        _, metrics = jax.jit(model.train_step)(
            state, device_batch, jax.random.PRNGKey(0))
        losses[fused] = float(metrics["loss"])
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


# ----------------------------------------------------------------------
def _np_pred_net(params, layers):
    """Numpy replica of the module's prediction-net step + joint
    parameter arrays, shared by the greedy and beam oracles."""
    emb = np.asarray(params["pred_embedding"])
    cells = [(np.asarray(params["pred_wx%d" % i]),
              np.asarray(params["pred_wh%d" % i]),
              np.asarray(params["pred_b%d" % i])) for i in range(layers)]
    sigmoid = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731

    def pred_step(states, token):
        x = emb[token]
        new = []
        for (wx, wh, b), (h_prev, c_prev) in zip(cells, states):
            gates = x @ wx + h_prev @ wh + b
            i, f, g, o = np.split(gates, 4, axis=-1)
            c = sigmoid(f + 1.0) * c_prev + sigmoid(i) * np.tanh(g)
            h = sigmoid(o) * np.tanh(c)
            new.append((h, c))
            x = h
        return new, x

    H = cells[0][1].shape[0]
    joint = {k: np.asarray(params[k]) for k in
             ("joint_enc_w", "joint_pred_w", "joint_b", "joint_out_w",
              "joint_out_b")}
    return pred_step, H, joint


def _np_greedy_oracle(params, enc, enc_len, blank, msf, Lmax, layers):
    """Python re-implementation of the frame-synchronous greedy loop
    from the extracted parameter arrays."""
    pred_step, H, j = _np_pred_net(params, layers)
    w_enc, w_pred = j["joint_enc_w"], j["joint_pred_w"]
    b_j, w_out, b_out = j["joint_b"], j["joint_out_w"], j["joint_out_b"]

    B, T, _ = enc.shape
    ids = np.full((B, Lmax), -1, np.int32)
    frames = np.full((B, Lmax), -1, np.int32)
    lens = np.zeros(B, np.int32)
    for b in range(B):
        states = [(np.zeros(H), np.zeros(H)) for _ in range(layers)]
        states, h = pred_step(states, blank)
        pred_j = h @ w_pred
        for t in range(int(enc_len[b])):
            enc_jt = enc[b, t] @ w_enc
            for _ in range(msf):
                logits = np.tanh(enc_jt + pred_j + b_j) @ w_out + b_out
                k = int(np.argmax(logits))
                if k == blank or lens[b] >= Lmax:
                    break
                ids[b, lens[b]] = k
                frames[b, lens[b]] = t
                lens[b] += 1
                states, h = pred_step(states, k)
                pred_j = h @ w_pred
    return ids, lens, frames


def test_greedy_decode_matches_oracle():
    rng = np.random.RandomState(3)
    B, T, D, V = 3, 12, 10, 6
    module = TransducerDecoderModule(
        tgt_vocab_size=V, pred_embed_size=8, pred_units=8, pred_layers=2,
        joint_dim=8, max_symbols_per_frame=3, max_output_length=0,
        dropout=0.0, fused_loss=False, beam_width=1, dtype_=jnp.float32,
        mode="infer")
    enc = rng.randn(B, T, D).astype(np.float32)
    enc_len = np.array([12, 7, 1], np.int32)
    input_dict = {"encoder_output": {"outputs": jnp.asarray(enc),
                                     "src_length": jnp.asarray(enc_len)}}
    variables = module.init(jax.random.PRNGKey(0), input_dict, False)
    out = jax.jit(lambda v, d: module.apply(v, d, False))(
        variables, input_dict)
    got_ids, got_lens = (np.asarray(out["outputs"][0]),
                         np.asarray(out["outputs"][1]))
    want_ids, want_lens, want_frames = _np_greedy_oracle(
        variables["params"], enc, enc_len, V - 1, 3, T, layers=2)
    np.testing.assert_array_equal(got_lens, want_lens)
    np.testing.assert_array_equal(got_ids, want_ids)
    # frame-synchronous emission timestamps match the oracle's
    np.testing.assert_array_equal(np.asarray(out["emit_frames"]),
                                  want_frames)
    assert got_lens[2] <= 3  # one active frame -> at most msf symbols


def test_greedy_decode_chunked_carry_matches_full():
    """Streaming contract: greedy decode over two chunks with the
    prediction-net carry + decode_window threaded through must emit
    exactly the full-utterance greedy token sequence (the cap must not
    bind: max_output_length is per call)."""
    rng = np.random.RandomState(5)
    B, T, D, V = 2, 12, 10, 6
    module = TransducerDecoderModule(
        tgt_vocab_size=V, pred_embed_size=8, pred_units=8, pred_layers=2,
        joint_dim=8, max_symbols_per_frame=3, max_output_length=3 * T,
        dropout=0.0, fused_loss=False, beam_width=1, dtype_=jnp.float32,
        mode="infer")
    enc = rng.randn(B, T, D).astype(np.float32)
    enc_len = np.array([12, 7], np.int32)   # chunk 2 partly past enc_len
    base = {"encoder_output": {"outputs": jnp.asarray(enc),
                               "src_length": jnp.asarray(enc_len)}}
    variables = module.init(jax.random.PRNGKey(0), base, False)
    apply = jax.jit(lambda v, d: module.apply(v, d, False))
    full = apply(variables, base)
    fids, flens = (np.asarray(full["outputs"][0]),
                   np.asarray(full["outputs"][1]))
    d1 = dict(base, decode_window=(jnp.zeros(B, jnp.int32),
                                   jnp.full((B,), 6, jnp.int32)))
    o1 = apply(variables, d1)
    d2 = dict(base, decode_window=(jnp.full((B,), 6, jnp.int32),
                                   jnp.full((B,), T, jnp.int32)),
              decode_carry=o1["decode_carry"])
    o2 = apply(variables, d2)
    for b in range(B):
        n1 = int(np.asarray(o1["outputs"][1])[b])
        n2 = int(np.asarray(o2["outputs"][1])[b])
        cat = np.concatenate([np.asarray(o1["outputs"][0])[b][:n1],
                              np.asarray(o2["outputs"][0])[b][:n2]])
        assert n1 + n2 == flens[b]
        np.testing.assert_array_equal(cat, fids[b][:flens[b]])


# ----------------------------------------------------------------------
def _np_beam_exhaustive_oracle(params, enc, enc_len, blank, msf, Lmax,
                               layers, fusion=None):
    """Enumerate EVERY expansion-limited alignment (<= msf labels per
    frame, then blank; <= Lmax labels total) and return the label
    sequence of the max-score alignment — what beam search with
    K >= #alignments must find. ``fusion`` = (table, C, m, init_ctx)
    adds the dense-LM shallow-fusion score to each label emission."""
    pred_step, H, j = _np_pred_net(params, layers)
    w_enc, w_pred = j["joint_enc_w"], j["joint_pred_w"]
    b_j, w_out, b_out = j["joint_b"], j["joint_out_w"], j["joint_out_b"]
    B, T, _ = enc.shape
    V = w_out.shape[1]
    ids = np.full((B, Lmax), -1, np.int32)
    lens = np.zeros(B, np.int32)
    for b in range(B):
        best = [-np.inf, []]
        states0 = [(np.zeros(H), np.zeros(H)) for _ in range(layers)]
        states0, h0 = pred_step(states0, blank)

        def rec(t, states, pred_j, score, labels, ctx):
            if t == int(enc_len[b]):
                if score > best[0]:
                    best[0], best[1] = score, list(labels)
                return
            enc_jt = enc[b, t] @ w_enc

            def expand(states, pred_j, score, labels, n, ctx):
                lp = _log_softmax_np(
                    np.tanh(enc_jt + pred_j + b_j) @ w_out + b_out)
                rec(t + 1, states, pred_j, score + lp[blank], labels,
                    ctx)
                if n < msf and len(labels) < Lmax:
                    for v in range(V):
                        if v == blank:
                            continue
                        st2, h2 = pred_step(states, v)
                        fuse, ctx2 = 0.0, ctx
                        if fusion is not None:
                            table, C, m, _ = fusion
                            fuse = float(table[ctx, v])
                            ctx2 = ctx // C + v * C ** (m - 1)
                        expand(st2, h2 @ w_pred, score + lp[v] + fuse,
                               labels + [v], n + 1, ctx2)

            expand(states, pred_j, score, labels, 0, ctx)

        rec(0, states0, h0 @ w_pred, 0.0, [],
            fusion[3] if fusion is not None else 0)
        lens[b] = len(best[1])
        ids[b, :lens[b]] = best[1]
    return ids, lens


def test_beam_decode_exhaustive_oracle():
    """With beam width >= the number of expansion-limited alignments,
    beam search is exhaustive: it must return exactly the max-score
    alignment's label sequence (enumerated by the numpy oracle)."""
    rng = np.random.RandomState(7)
    B, T, D, V, msf, Lmax = 2, 2, 6, 4, 2, 8
    # alignments per frame: 1 + 3 + 9 = 13; T=2 -> 169 total; K=192
    module = TransducerDecoderModule(
        tgt_vocab_size=V, pred_embed_size=6, pred_units=6, pred_layers=1,
        joint_dim=6, max_symbols_per_frame=msf, max_output_length=Lmax,
        dropout=0.0, fused_loss=False, beam_width=192,
        dtype_=jnp.float32, mode="infer")
    enc = (rng.randn(B, T, D) * 1.5).astype(np.float32)
    enc_len = np.array([2, 1], np.int32)
    input_dict = {"encoder_output": {"outputs": jnp.asarray(enc),
                                     "src_length": jnp.asarray(enc_len)}}
    variables = module.init(jax.random.PRNGKey(1), input_dict, False)
    out = jax.jit(lambda v, d: module.apply(v, d, False))(
        variables, input_dict)
    got_ids, got_lens = (np.asarray(out["outputs"][0]),
                         np.asarray(out["outputs"][1]))
    want_ids, want_lens = _np_beam_exhaustive_oracle(
        variables["params"], enc, enc_len, V - 1, msf, Lmax, layers=1)
    np.testing.assert_array_equal(got_lens, want_lens)
    for b in range(B):
        np.testing.assert_array_equal(got_ids[b, :got_lens[b]],
                                      want_ids[b, :want_lens[b]])


def test_beam_decode_small_width_runs_and_is_sane():
    """K=4 beam on a longer input: static shapes, finite scores, ids in
    vocab, no emissions past enc_len (inactive frames must carry)."""
    rng = np.random.RandomState(8)
    B, T, D, V = 3, 10, 8, 6
    module = TransducerDecoderModule(
        tgt_vocab_size=V, pred_embed_size=8, pred_units=8, pred_layers=2,
        joint_dim=8, max_symbols_per_frame=3, max_output_length=0,
        dropout=0.0, fused_loss=False, beam_width=4, dtype_=jnp.float32,
        mode="infer")
    enc = rng.randn(B, T, D).astype(np.float32)
    enc_len = np.array([10, 5, 1], np.int32)
    input_dict = {"encoder_output": {"outputs": jnp.asarray(enc),
                                     "src_length": jnp.asarray(enc_len)}}
    variables = module.init(jax.random.PRNGKey(2), input_dict, False)
    out = jax.jit(lambda v, d: module.apply(v, d, False))(
        variables, input_dict)
    ids, lens = (np.asarray(out["outputs"][0]),
                 np.asarray(out["outputs"][1]))
    assert ids.shape == (B, T) and lens.shape == (B,)
    for b in range(B):
        assert 0 <= lens[b] <= min(T, 3 * enc_len[b])
        assert np.all(ids[b, :lens[b]] >= 0)
        assert np.all(ids[b, :lens[b]] < V - 1)   # no blank emitted
        assert np.all(ids[b, lens[b]:] == -1)


# ----------------------------------------------------------------------
def _build(toy, mode="train", **cfg_kw):
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        transducer_test_config)
    base_params, eval_params = transducer_test_config(
        toy["csv"], toy["vocab"], **cfg_kw)
    if mode == "eval":
        nested_update(base_params, eval_params)
    return Speech2Text(params=base_params, mode=mode)


def test_build_and_single_step(toy_speech_data):
    model = _build(toy_speech_data, num_epochs=1)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_convergence_transducer(toy_speech_data):
    """Conformer-Transducer must converge on the toy set through the
    unchanged Speech2Text stack (loss drop + small WER)."""
    train_model = _build(toy_speech_data, "train", num_epochs=150)
    result = trainer.train(train_model)
    final_loss = float(result["last_metrics"]["loss"])
    assert final_loss < 1.0, "loss did not converge: {}".format(final_loss)
    eval_model = _build(toy_speech_data, "eval", num_epochs=150)
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert metrics["Eval WER"] < 0.1, metrics


# ----------------------------------------------------------------------
# streaming (TransducerFrameASR): trained toy model, chunked audio
# ----------------------------------------------------------------------
def _toy_corpus_feature_stats(data_dir, base_params):
    """Fixed per-feature normalization over the toy corpus (streaming-
    correct: per-utterance stats don't exist in a stream; same recipe as
    the CTC streaming test, tests/test_asr_inference_stack.py)."""
    from openseq2seq_tpu.ops.features import get_speech_features_from_file
    import os
    params = dict(base_params["data_layer_params"])
    params["features_mean"] = 0.0
    params["features_std_dev"] = 1.0
    feats = []
    for i in range(10):
        path = os.path.join(data_dir, "toy_{}.wav".format(i))
        f, _ = get_speech_features_from_file(path, params)
        feats.append(f)
    allf = np.concatenate(feats, axis=0)
    return allf.mean(axis=0), allf.std(axis=0) + 1e-6


@pytest.fixture(scope="module")
def trained_toy_transducer(tmp_path_factory):
    import os
    from openseq2seq_tpu.test_utils import toy_speech
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        transducer_test_config)
    out = tmp_path_factory.mktemp("rnnt_stream")
    csv, vocab = toy_speech.generate(str(out / "data"))
    logdir = str(out / "logs")
    base_params, _ = transducer_test_config(csv, vocab, logdir=logdir,
                                            num_epochs=150)
    mean, std = _toy_corpus_feature_stats(str(out / "data"), base_params)
    base_params["data_layer_params"]["features_mean"] = mean
    base_params["data_layer_params"]["features_std_dev"] = std
    base_params["save_checkpoint_steps"] = 150
    model = Speech2Text(params=base_params, mode="train")
    trainer.train(model)
    ckpt = os.path.join(logdir, "checkpoints", "150")
    assert os.path.isdir(ckpt)
    return {"csv": csv, "vocab": vocab, "ckpt": ckpt, "dir": str(out),
            "mean": mean, "std": std}


@pytest.mark.slow
def test_transducer_frame_asr_streaming(trained_toy_transducer):
    """Chunked live decoding through TransducerFrameASR: the carried
    prediction-net state + decode_window consume each encoder frame
    exactly once, so the streamed transcript must recover the reference
    text without CTC-style merge heuristics."""
    import os
    from scipy.io import wavfile
    from openseq2seq_tpu.apps.frame_asr import TransducerFrameASR
    from openseq2seq_tpu.test_utils.test_speech_configs import (
        transducer_test_config)
    from openseq2seq_tpu.utils.metrics import levenshtein

    toy = trained_toy_transducer
    base_params, _ = transducer_test_config(toy["csv"], toy["vocab"],
                                            num_epochs=150)
    base_params["data_layer_params"]["features_mean"] = toy["mean"]
    base_params["data_layer_params"]["features_std_dev"] = toy["std"]
    model = Speech2Text(params=base_params, mode="interactive_infer")
    # 10 ms hop x 4 Conformer subsampling = 0.04 s per encoder frame
    asr = TransducerFrameASR(model, checkpoint=toy["ckpt"],
                             frame_len=0.2, frame_overlap=0.4,
                             timestep_duration=0.04)
    sr, signal = wavfile.read(
        os.path.join(toy["dir"], "data", "toy_0.wav"))
    signal = signal.astype(np.float32) / 32767.0
    n = asr.n_frame_len
    pad = (-len(signal)) % n
    rng = np.random.RandomState(7)
    signal = np.concatenate(
        [signal, (rng.randn(pad) * 1e-3).astype(np.float32)])
    text = ""
    for i in range(0, len(signal), n):
        text += asr.transcribe(signal[i:i + n])
    text += asr.flush()
    # toy_0 transcript is "abc bca" (boundary effects may perturb edges)
    assert levenshtein(list("abc bca"), list(text.strip())) <= 3, text


# ------------------------------------------------------------- FastEmit

def _replica_loss(logits, logit_lens, labels, label_lens, blank,
                  sg_blank):
    """Plain-JAX lattice replica (Python loops, tiny shapes only).
    With sg_blank=True every blank log-prob (incl. the final one) is
    stop-gradient'd, so its gradient is exactly the emission-only part
    of the loss gradient — the piece FastEmit scales by lambda."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    B = logits.shape[0]
    out = []
    for b in range(B):
        Tb, Ub = int(logit_lens[b]), int(label_lens[b])
        alpha = {(0, 0): 0.0}
        for t in range(Tb):
            for u in range(Ub + 1):
                if t == 0 and u == 0:
                    continue
                terms = []
                if t > 0:
                    blk = lp[b, t - 1, u, blank]
                    if sg_blank:
                        blk = jax.lax.stop_gradient(blk)
                    terms.append(alpha[(t - 1, u)] + blk)
                if u > 0:
                    terms.append(alpha[(t, u - 1)] +
                                 lp[b, t, u - 1, labels[b, u - 1]])
                alpha[(t, u)] = (terms[0] if len(terms) == 1
                                 else jnp.logaddexp(terms[0], terms[1]))
        fb = lp[b, Tb - 1, Ub, blank]
        if sg_blank:
            fb = jax.lax.stop_gradient(fb)
        out.append(-(alpha[(Tb - 1, Ub)] + fb))
    return jnp.stack(out).mean()


def test_fastemit_value_unchanged_grads_match_surrogate():
    """FastEmit scales the emission-gradient cotangent by (1 + lam) and
    leaves the loss VALUE untouched; its gradient therefore equals
    grad(F) + lam * grad(F with blanks stop-gradient'd) — checked
    against the loop replica (arXiv:2010.11148 eq. 10 semantics)."""
    rng = np.random.RandomState(11)
    B, T, U, V = 2, 4, 3, 5
    lam = 0.7
    logits = jnp.asarray(rng.randn(B, T, U + 1, V).astype(np.float32))
    labels = np.asarray(rng.randint(0, V - 1, (B, U)), np.int32)
    logit_lens = np.array([4, 3], np.int32)
    label_lens = np.array([3, 2], np.int32)
    args = (jnp.asarray(logit_lens), jnp.asarray(labels),
            jnp.asarray(label_lens))

    def f(x, lam_):
        return transducer_loss(x, *args, fastemit_lambda=lam_)

    v0, g0 = jax.value_and_grad(f)(logits, 0.0)
    v1, g1 = jax.value_and_grad(f)(logits, lam)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)

    blank = V - 1
    g_full = jax.grad(_replica_loss)(logits, logit_lens, labels,
                                     label_lens, blank, False)
    g_emit = jax.grad(_replica_loss)(logits, logit_lens, labels,
                                     label_lens, blank, True)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g_full),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g_full) + lam * np.asarray(g_emit),
        rtol=1e-4, atol=1e-6)


def test_fastemit_fused_matches_unfused():
    """The diagonal-fused loss applies the same emission-gradient scale
    inside its checkpointed block step."""
    rng = np.random.RandomState(12)
    B, T, U, J, V = 2, 5, 3, 4, 6
    lam = 0.3
    enc_j = rng.randn(B, T, J).astype(np.float32)
    pred_j = rng.randn(B, U + 1, J).astype(np.float32)
    joint_b = rng.randn(J).astype(np.float32) * 0.1
    out_w = rng.randn(J, V).astype(np.float32)
    out_b = rng.randn(V).astype(np.float32) * 0.1
    labels = rng.randint(0, V - 1, (B, U)).astype(np.int32)
    args = (jnp.asarray(np.array([5, 3], np.int32)),
            jnp.asarray(labels),
            jnp.asarray(np.array([3, 2], np.int32)))

    def dense(enc_j, pred_j, joint_b, out_w, out_b):
        h = jnp.tanh(enc_j[:, :, None, :] + pred_j[:, None, :, :] +
                     joint_b)
        return transducer_loss(h @ out_w + out_b, *args,
                               fastemit_lambda=lam)

    def fused(enc_j, pred_j, joint_b, out_w, out_b):
        from openseq2seq_tpu.ops.transducer import transducer_loss_fused
        return transducer_loss_fused(enc_j, pred_j, joint_b, out_w,
                                     out_b, *args, block_size=4,
                                     fastemit_lambda=lam)

    inputs = tuple(jnp.asarray(a) for a in
                   (enc_j, pred_j, joint_b, out_w, out_b))
    v_d, g_d = jax.value_and_grad(dense, argnums=(0, 1, 3))(*inputs)
    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 3))(*inputs)
    np.testing.assert_allclose(float(v_f), float(v_d), rtol=1e-5)
    for gf, gd in zip(g_f, g_d):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------- shallow fusion

def _toy_fusion_lm(tmp_path, labels, order=3):
    from openseq2seq_tpu.ops.arpa_lm import build_arpa
    from openseq2seq_tpu.ops.ngram_fusion import dense_label_lm
    rng = np.random.RandomState(3)
    sents = [[labels[i % len(labels)] for i in
              range(s, s + 4)] for s in range(6)]
    sents += [list("abc"), list("bca"), list("cab")]
    path = str(tmp_path / "fusion.arpa")
    build_arpa([s for s in sents], path, order=order)
    return path, dense_label_lm(path, tuple(labels), order)


def test_dense_lm_matches_arpa_sentence_score(tmp_path):
    """The rolling-context table must reproduce ArpaLM's own Katz
    scoring for any label sequence when the table order covers the LM
    order (BOS padding included)."""
    import math
    from openseq2seq_tpu.ops.arpa_lm import ArpaLM
    from openseq2seq_tpu.ops.ngram_fusion import sequence_fusion_score
    labels = ["a", "b", "c"]
    path, (table, C, m, ctx0) = _toy_fusion_lm(tmp_path, labels)
    lm = ArpaLM(path)
    for seq in [[0], [0, 1, 2], [2, 2, 0, 1, 0, 2]]:
        got = sequence_fusion_score(table, C, m, ctx0, seq)
        want = lm.sentence_log10([labels[i] for i in seq],
                                 bos=True, eos=False) * math.log(10.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_beam_decode_fusion_exhaustive_oracle(tmp_path):
    """Shallow-fusion beam search must return the alignment maximizing
    acoustic + lambda*LM + beta*len — verified against the exhaustive
    numpy oracle extended with the same dense table."""
    rng = np.random.RandomState(9)
    labels = ["a", "b", "c"]
    w_lm, beta = 0.7, 0.3
    path, (table, C, m, ctx0) = _toy_fusion_lm(tmp_path, labels)
    B, T, D, V, msf, Lmax = 2, 2, 6, 4, 2, 8
    module = TransducerDecoderModule(
        tgt_vocab_size=V, pred_embed_size=6, pred_units=6, pred_layers=1,
        joint_dim=6, max_symbols_per_frame=msf, max_output_length=Lmax,
        dropout=0.0, fused_loss=False, beam_width=192,
        dtype_=jnp.float32, mode="infer",
        lm_fusion=(path, tuple(labels), w_lm, beta, 3))
    enc = (rng.randn(B, T, D) * 1.5).astype(np.float32)
    enc_len = np.array([2, 1], np.int32)
    input_dict = {"encoder_output": {"outputs": jnp.asarray(enc),
                                     "src_length": jnp.asarray(enc_len)}}
    variables = module.init(jax.random.PRNGKey(1), input_dict, False)
    out = jax.jit(lambda v, d: module.apply(v, d, False))(
        variables, input_dict)
    got_ids, got_lens = (np.asarray(out["outputs"][0]),
                         np.asarray(out["outputs"][1]))
    want_ids, want_lens = _np_beam_exhaustive_oracle(
        variables["params"], enc, enc_len, V - 1, msf, Lmax, layers=1,
        fusion=(table * w_lm + beta, C, m, ctx0))
    np.testing.assert_array_equal(got_lens, want_lens)
    for b in range(B):
        np.testing.assert_array_equal(got_ids[b, :got_lens[b]],
                                      want_ids[b, :want_lens[b]])


def test_fusion_lm_space_label_escape(tmp_path):
    """ARPA tokens are whitespace-delimited; a vocab containing the
    literal space label must round-trip through build_label_lm's <sp>
    escape and densify to finite, discriminative scores."""
    from openseq2seq_tpu.ops.ngram_fusion import (build_label_lm,
                                                  dense_label_lm)
    path = str(tmp_path / "sp.arpa")
    build_label_lm(["ab ab ab", "ba ba", "ab ba"], path, order=3)
    labels = ("a", "b", " ")
    table, C, m, ctx0 = dense_label_lm(path, labels, 3)
    assert np.all(np.isfinite(table))
    # after "ab" the corpus always has a space: P(' '|a,b) must beat
    # P('a'|a,b) and P('b'|a,b)
    a, b, sp = 0, 1, 2
    ctx_ab = a * 1 + b * C        # oldest digit lowest: ('a','b')
    assert table[ctx_ab, sp] > table[ctx_ab, a]
    assert table[ctx_ab, sp] > table[ctx_ab, b]


def test_beam_decode_nbest_contract():
    """Beam decode exposes the full beam as ``nbest`` = [ids (B,K,L),
    lens (B,K), scores (B,K)], score-sorted, with lane 0 == outputs —
    the host-side rescoring input contract (apps/lm_rescorer.py)."""
    rng = np.random.RandomState(13)
    B, T, D, V, K = 3, 4, 6, 5, 6
    module = TransducerDecoderModule(
        tgt_vocab_size=V, pred_embed_size=6, pred_units=6, pred_layers=1,
        joint_dim=6, max_symbols_per_frame=2, max_output_length=8,
        dropout=0.0, fused_loss=False, beam_width=K,
        dtype_=jnp.float32, mode="infer")
    enc = (rng.randn(B, T, D) * 1.5).astype(np.float32)
    enc_len = np.array([4, 2, 3], np.int32)
    input_dict = {"encoder_output": {"outputs": jnp.asarray(enc),
                                     "src_length": jnp.asarray(enc_len)}}
    variables = module.init(jax.random.PRNGKey(1), input_dict, False)
    out = jax.jit(lambda v, d: module.apply(v, d, False))(
        variables, input_dict)
    ids, lens, scores = [np.asarray(x) for x in out["nbest"]]
    assert ids.shape == (B, K, 8) and lens.shape == (B, K) \
        and scores.shape == (B, K)
    np.testing.assert_array_equal(np.asarray(out["outputs"][0]),
                                  ids[:, 0])
    np.testing.assert_array_equal(np.asarray(out["outputs"][1]),
                                  lens[:, 0])
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    assert np.all(np.isfinite(scores[:, 0]))
