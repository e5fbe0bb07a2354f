"""Transformer-XL LM encoder: relative-attention alignment (gather vs
naive loop), segment-memory equivalence, end-to-end LM training and
rescoring through the unchanged LSTMLM/NeuralRescorer stack (parity
with the reference's external Transformer-XL rescorer,
`/root/reference/external_lm_rescore/transformerxl/mem_transformer.py`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.decoders import FakeDecoder
from openseq2seq_tpu.encoders import TransformerXLEncoder
from openseq2seq_tpu.encoders.transformer_xl_encoder import (
    RelMultiHeadAttention, TransformerXLNet, rel_pos_embedding)
from openseq2seq_tpu.losses import BasicSequenceLoss
from openseq2seq_tpu.models import LSTMLM
from openseq2seq_tpu.training import trainer
from tests.test_lm import _lm_config


def _naive_rel_attention(params, x, mems=None):
    """Loop-based reference: score[i,j] = (q_i+u)·k_j + (q_i+w)·R[d],
    d = M + i - j, causal. Differential oracle for the static
    distance-gather in the module."""
    p = params["params"]
    B, T, D = x.shape
    ctx = x if mems is None else np.concatenate([mems, x], axis=1)
    M = ctx.shape[1] - T
    K = ctx.shape[1]
    H, Dh = p["u_bias"].shape[0], p["u_bias"].shape[1]
    qk = lambda name, inp: np.einsum(  # noqa: E731
        "btd,dhe->bthe", inp, np.asarray(p[name]["kernel"]))
    q, k, v = qk("q", x), qk("k", ctx), qk("v", ctx)
    r = np.asarray(rel_pos_embedding(K, D))
    r = np.einsum("kd,dhe->khe", r, np.asarray(p["r"]["kernel"]))
    u, w = np.asarray(p["u_bias"]), np.asarray(p["w_bias"])
    out = np.zeros((B, T, H, Dh), np.float32)
    for b in range(B):
        for h in range(H):
            scores = np.full((T, K), -1e9, np.float32)
            for i in range(T):
                for j in range(K):
                    d = M + i - j
                    if d < 0:
                        continue
                    scores[i, j] = (
                        (q[b, i, h] + u[h]) @ k[b, j, h] +
                        (q[b, i, h] + w[h]) @ r[d, h]) / np.sqrt(Dh)
            wts = np.exp(scores - scores.max(axis=1, keepdims=True))
            wts /= wts.sum(axis=1, keepdims=True)
            out[b, :, h] = wts @ v[b, :, h]
    proj = np.asarray(p["out"]["kernel"])                  # (H, Dh, D)
    return np.einsum("bthe,hed->btd", out, proj)


def test_rel_attention_matches_naive_loop():
    rng = np.random.RandomState(0)
    B, T, D, H, M = 2, 5, 16, 4, 3
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mems = jnp.asarray(rng.randn(B, M, D), jnp.float32)
    mod = RelMultiHeadAttention(num_heads=H, dropout=0.0)
    variables = mod.init(jax.random.PRNGKey(0), x, mems=mems)
    got = mod.apply(variables, x, mems=mems)
    want = _naive_rel_attention(variables, np.asarray(x),
                                np.asarray(mems))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    # mem-less path too
    got0 = mod.apply(variables, x)
    want0 = _naive_rel_attention(variables, np.asarray(x))
    np.testing.assert_allclose(np.asarray(got0), want0, atol=1e-4)


def test_segment_memory_matches_full_context():
    """Scoring [seg1][seg2] with mems == scoring the concatenation:
    the reference's segment-level recurrence contract."""
    rng = np.random.RandomState(1)
    V, T1, T2, B = 11, 8, 8, 2
    net = TransformerXLNet(vocab_size=V, num_layers=2, hidden_size=16,
                           num_heads=4, filter_size=32, dropout=0.0,
                           attention_dropout=0.0, mem_len=T1,
                           dtype_=jnp.float32)
    full = jnp.asarray(rng.randint(0, V, (B, T1 + T2)))
    lengths = jnp.full((B,), T1 + T2)
    variables = net.init(jax.random.PRNGKey(0), full, lengths, False)
    out_full = net.apply(variables, full, lengths, False)

    out1 = net.apply(variables, full[:, :T1], jnp.full((B,), T1), False)
    out2 = net.apply(variables, full[:, T1:], jnp.full((B,), T2), False,
                     mems=out1["mems"])
    np.testing.assert_allclose(
        np.asarray(out2["logits"]),
        np.asarray(out_full["logits"][:, T1:]), atol=2e-3)


def test_mems_valid_masks_padded_memory():
    """Memory positions flagged invalid (padding in the previous
    segment) must not influence the current segment: randomizing their
    content leaves the logits unchanged."""
    rng = np.random.RandomState(2)
    V, T, B, M = 7, 4, 2, 4
    net = TransformerXLNet(vocab_size=V, num_layers=2, hidden_size=16,
                           num_heads=4, filter_size=32, dropout=0.0,
                           attention_dropout=0.0, mem_len=M,
                           dtype_=jnp.float32)
    x = jnp.asarray(rng.randint(0, V, (B, T)))
    lengths = jnp.full((B,), T)
    variables = net.init(jax.random.PRNGKey(0), x, lengths, False)
    mems = [jnp.asarray(rng.randn(B, M, 16), jnp.float32)
            for _ in range(2)]
    valid = jnp.asarray([[True, True, False, False],
                         [True, True, True, False]])
    out1 = net.apply(variables, x, lengths, False, mems=mems,
                     mems_valid=valid)
    trash = [m + jnp.where(valid[..., None], 0.0, 100.0) for m in mems]
    out2 = net.apply(variables, x, lengths, False, mems=trash,
                     mems_valid=valid)
    np.testing.assert_allclose(np.asarray(out1["logits"]),
                               np.asarray(out2["logits"]), atol=1e-5)
    # ...and flipping a VALID position must change them
    trash2 = [m + 1.0 for m in mems]
    assert not np.allclose(np.asarray(out1["logits"]),
                           np.asarray(net.apply(
                               variables, x, lengths, False,
                               mems=trash2,
                               mems_valid=valid)["logits"]))


def _txl_config(data_root, tmpdir, num_epochs=2):
    cfg = _lm_config(data_root, tmpdir, num_epochs=num_epochs)
    cfg["encoder"] = TransformerXLEncoder
    cfg["encoder_params"] = {
        "num_layers": 2, "hidden_size": 32, "num_heads": 4,
        "filter_size": 64, "dropout": 0.0, "attention_dropout": 0.0,
        "mem_len": 0,
    }
    return cfg


@pytest.mark.slow
def test_txl_lm_converges_and_rescoring(tmp_path_factory, tmp_path):
    from openseq2seq_tpu.apps.lm_rescorer import NeuralRescorer
    out = tmp_path_factory.mktemp("txl_corpus")
    with open(out / "train.txt", "w") as f:
        for _ in range(200):
            f.write("aa bb cc dd\n")
    for split in ("valid", "test"):
        with open(out / "{}.txt".format(split), "w") as f:
            for _ in range(20):
                f.write("aa bb cc dd\n")

    cfg = _txl_config(str(out), str(tmp_path), num_epochs=30)
    cfg["logdir"] = str(tmp_path / "txl_logs")
    cfg["save_checkpoint_steps"] = 10**9
    model = LSTMLM(params=cfg, mode="train")
    trainer.train(model)
    import os
    ckpts = os.listdir(os.path.join(cfg["logdir"], "checkpoints"))
    ckpt = os.path.join(cfg["logdir"], "checkpoints", max(ckpts, key=int))

    lm_model = LSTMLM(params=_txl_config(str(out), str(tmp_path)),
                      mode="eval")
    rescorer = NeuralRescorer(lm_model, ckpt)
    scores = rescorer.lm_scores(["aa bb cc dd", "aa dd bb cc"])
    assert scores[0] > scores[1]
    nbest = [[(-1.0, "aa dd bb cc"), (-1.2, "aa bb cc dd")]]
    assert rescorer.rescore(nbest, lm_weight=0.5)[0] == "aa bb cc dd"


def test_causal_rel_shift_equals_gather():
    """The causal pad-reshape shift over the reversed table reproduces
    the distance gather bd[t,j] = P[t, M+t-j] at every unmasked
    (dist>=0) position, with and without memory."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    for M, T in [(0, 6), (4, 6), (5, 1)]:
        K = M + T
        B, H, Dh = 2, 3, 4
        qw = rng.randn(B, T, H, Dh)
        table = rng.randn(K, H, Dh)         # row d: distance d

        pos_nat = np.einsum("bthd,khd->bhtk", qw, table)
        dist = M + np.arange(T)[:, None] - np.arange(K)[None, :]
        gather = np.clip(dist, 0, K - 1)
        want = np.take_along_axis(pos_nat, gather[None, None], axis=3)

        ps = jnp.asarray(np.einsum("bthd,khd->bhtk", qw, table[::-1]))
        ps = jnp.pad(ps, ((0, 0), (0, 0), (0, 0), (1, 0)))
        ps = ps.reshape(B, H, K + 1, T)[:, :, 1:, :]
        got = np.asarray(ps.reshape(B, H, T, K))

        valid = (dist >= 0)[None, None]
        np.testing.assert_allclose(np.where(valid, got, 0.0),
                                   np.where(valid, want, 0.0),
                                   rtol=1e-6, atol=1e-8)
