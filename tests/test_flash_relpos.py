"""Rel-pos flash attention (`ops/flash_relpos.py`): kernel fwd/bwd vs a
dense reference, exactness of the separable rel-pos fold vs the XLA
pad-reshape shift path, and RelPosSelfAttention integration (flash path
vs plain path with shared params)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.ops import flash_relpos as fr


def _dense_reference(q, k, v, lengths, scale):
    """Plain masked softmax attention (fp32)."""
    s = jnp.einsum("bhtd,bhkd->bhtk", q, k).astype(jnp.float32) * scale
    T = k.shape[2]
    mask = jnp.arange(T)[None, :] < jnp.maximum(lengths, 1)[:, None]
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhtk,bhkd->bhtd", w, v.astype(jnp.float32))


def _mk(B=2, H=3, T=70, dqk=40, dv=24, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, T, dqk), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, dqk), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, dv), jnp.float32)
    lengths = jnp.asarray([T, T - 27] + [T] * (B - 2), jnp.int32)[:B]
    return q, k, v, lengths


def test_forward_matches_dense():
    q, k, v, lengths = _mk()
    scale = 0.17
    want = _dense_reference(q, k, v, lengths, scale)
    got = fr.flash_attention(q, k, v, lengths, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_blocked_multiple_tiles():
    # T spans several q and k blocks (exercises the online-softmax
    # accumulation across the inner grid dim)
    q, k, v, lengths = _mk(B=2, H=2, T=300, dqk=16, dv=16, seed=3)
    scale = 0.25
    want = _dense_reference(q, k, v, lengths, scale)
    got = fr.flash_attention(q, k, v, lengths, scale, block_q=128,
                             block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_dense():
    q, k, v, lengths = _mk(B=2, H=2, T=80, dqk=24, dv=16, seed=1)
    scale = 0.2

    def loss_flash(q, k, v):
        o = fr.flash_attention(q, k, v, lengths, scale, interpret=True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_dense(q, k, v):
        o = _dense_reference(q, k, v, lengths, scale)
        return jnp.sum(jnp.sin(o))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg="d" + name)


def test_padded_key_rows_get_zero_grad():
    q, k, v, lengths = _mk(B=1, H=1, T=64, dqk=8, dv=8, seed=2)
    lengths = jnp.asarray([40], jnp.int32)

    def loss(k, v):
        o = fr.flash_attention(q, k, v, lengths, 0.3, interpret=True)
        return jnp.sum(o ** 2)

    dk, dv_ = jax.grad(loss, argnums=(0, 1))(k, v)
    assert float(jnp.abs(dk[0, 0, 40:]).max()) == 0.0
    assert float(jnp.abs(dv_[0, 0, 40:]).max()) == 0.0
    assert float(jnp.abs(dk[0, 0, :40]).max()) > 0.0


# ---------------------------------------------------------------------------
# the separable rel-pos fold
# ---------------------------------------------------------------------------
def _xla_bd(q_w, r_kernel, T, D):
    """The XLA path's position term: reversed table + pad-reshape
    shift (conformer_encoder.RelPosSelfAttention)."""
    from openseq2seq_tpu.encoders.transformer_xl_encoder import \
        rel_pos_embedding
    B, T_, H, Dh = q_w.shape
    r = rel_pos_embedding(2 * T - 1, D)[::-1]
    r = jnp.einsum("rp,phd->rhd", r, r_kernel)
    pos_score = jnp.einsum("bthd,rhd->bhtr", q_w, r)
    ps = jnp.pad(pos_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
    ps = ps.reshape(B, H, 2 * T, T)[:, :, 1:, :]
    return ps.reshape(B, H, T, 2 * T - 1)[:, :, :, :T]


def test_fold_relpos_scores_exact():
    B, T, H, Dh, D = 2, 50, 4, 16, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, H, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, H, Dh), jnp.float32)
    u = jnp.asarray(rng.randn(H, Dh), jnp.float32) * 0.1
    w = jnp.asarray(rng.randn(H, Dh), jnp.float32) * 0.1
    K_r = jnp.asarray(rng.randn(D, H, Dh), jnp.float32) * 0.2

    ac = jnp.einsum("bthd,bkhd->bhtk", q + u, k)
    bd = _xla_bd(q + w, K_r, T, D)
    want = ac + bd

    q_aug, k_pos = fr.fold_relpos(q + u, q + w, K_r, T, D)
    k_aug = jnp.concatenate(
        [k.transpose(0, 2, 1, 3),
         jnp.broadcast_to(k_pos[None, None], (B, H, T, D))], axis=-1)
    got = jnp.einsum("bhtd,bhkd->bhtk", q_aug, k_aug)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_relpos_attention_flash_matches_plain():
    """End to end through RelPosSelfAttention: flash (interpret kernel)
    vs the plain XLA path, same params."""
    from openseq2seq_tpu.encoders.conformer_encoder import \
        RelPosSelfAttention
    B, T, D, H = 2, 60, 64, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    pad_mask = jnp.arange(T)[None, :] < jnp.asarray([T, T - 17])[:, None]

    plain = RelPosSelfAttention(num_heads=H, dropout=0.0)
    params = plain.init(jax.random.PRNGKey(0), x, pad_mask, False)
    want = plain.apply(params, x, pad_mask, False)

    flash = RelPosSelfAttention(num_heads=H, dropout=0.0, use_flash=True)
    old = fr.FORCE_INTERPRET
    fr.FORCE_INTERPRET = True
    try:
        got = flash.apply(params, x, pad_mask, False)
    finally:
        fr.FORCE_INTERPRET = old
    # padded query rows differ only through downstream masking; compare
    # the valid rows
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1, :T - 17]),
                               np.asarray(want[1, :T - 17]),
                               rtol=2e-4, atol=2e-4)


def test_relpos_attention_flash_grads_close():
    from openseq2seq_tpu.encoders.conformer_encoder import \
        RelPosSelfAttention
    B, T, D, H = 2, 40, 32, 2
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    pad_mask = jnp.arange(T)[None, :] < jnp.asarray([T, T - 9])[:, None]
    mask_f = pad_mask[..., None].astype(jnp.float32)

    plain = RelPosSelfAttention(num_heads=H, dropout=0.0)
    params = plain.init(jax.random.PRNGKey(0), x, pad_mask, False)
    flash = RelPosSelfAttention(num_heads=H, dropout=0.0, use_flash=True)

    def loss(p, mod):
        return jnp.sum((mod.apply(p, x, pad_mask, False) * mask_f) ** 2)

    g_plain = jax.grad(loss)(params, plain)
    old = fr.FORCE_INTERPRET
    fr.FORCE_INTERPRET = True
    try:
        g_flash = jax.grad(loss)(params, flash)
    finally:
        fr.FORCE_INTERPRET = old
    flat1 = jax.tree_util.tree_leaves_with_path(g_plain)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g_flash))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(flat2[path]), np.asarray(leaf),
            rtol=5e-3, atol=5e-3,
            err_msg=jax.tree_util.keystr(path))
