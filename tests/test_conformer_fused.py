"""Fused Conformer conv-module Pallas kernel (`ops/conformer_pallas.py`)
vs the XLA path of `encoders/conformer_encoder._ConvModule` — forward
and gradient equivalence in interpreter mode, masking edge cases, and
shared-param-tree interchangeability."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openseq2seq_tpu.encoders.conformer_encoder import _ConvModule
from openseq2seq_tpu.ops import conformer_pallas as cp


def _mk(B=3, T=50, D=128, k=7, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D), dtype)
    lengths = jnp.asarray([T, T - 13, 5][:B] + [T] * max(0, B - 3),
                          jnp.int32)
    mod = _ConvModule(kernel_size=k, dropout=0.0, norm="layer_norm",
                      dtype=dtype, fused=False)
    params = mod.init(jax.random.PRNGKey(seed), x, lengths, False)
    return x, lengths, mod, params


def _fused_apply(params, x, lengths):
    p = params["params"]
    return cp.conformer_conv_module(
        x, lengths, p["ln1_scale"], p["ln1_bias"], p["pw1_kernel"],
        p["pw1_bias"], p["dw_kernel"], p["dw_bias"], p["ln2_scale"],
        p["ln2_bias"], p["pw2_kernel"], p["pw2_bias"], interpret=True)


def test_forward_matches_xla():
    x, lengths, mod, params = _mk()
    want = mod.apply(params, x, lengths, False)
    got = _fused_apply(params, x, lengths)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_odd_shapes_and_zero_length():
    # B=5 (pads to 8), T=37 (pads to 40), one zero-length row
    x, _, mod, params = _mk(B=5, T=37, D=128, k=31, seed=1)
    lengths = jnp.asarray([37, 20, 0, 1, 36], jnp.int32)
    want = mod.apply(params, x, lengths, False)
    got = _fused_apply(params, x, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    x, lengths, mod, params = _mk(B=2, T=24, D=128, k=5, seed=2)
    cot = jnp.asarray(np.random.RandomState(9).randn(*x.shape),
                      jnp.float32)

    def loss_xla(params, x):
        return jnp.sum(mod.apply(params, x, lengths, False) * cot)

    def loss_fused(params, x):
        return jnp.sum(_fused_apply(params, x, lengths) * cot)

    gw_x, gx_x = jax.grad(loss_xla, argnums=(0, 1))(params, x)
    gw_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    flat_x = jax.tree_util.tree_leaves_with_path(gw_x)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gw_f))
    assert len(flat_x) == len(flat_f) == 10
    for path, want in flat_x:
        got = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_fused_flag_uses_same_param_tree():
    """fused=True and fused=False modules share one weight tree, so
    checkpoints are interchangeable between the two compute paths."""
    x, lengths, _, _ = _mk(B=2, T=16, D=128, k=3)
    unfused = _ConvModule(kernel_size=3, dropout=0.0, norm="layer_norm",
                          dtype=jnp.float32, fused=False)
    fused = _ConvModule(kernel_size=3, dropout=0.0, norm="layer_norm",
                        dtype=jnp.float32, fused=True)
    p_u = unfused.init(jax.random.PRNGKey(3), x, lengths, False)
    p_f = fused.init(jax.random.PRNGKey(3), x, lengths, False)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_u, p_f))
    # on CPU without FORCE_INTERPRET the fused module silently runs the
    # XLA path — outputs identical
    np.testing.assert_array_equal(
        np.asarray(fused.apply(p_f, x, lengths, False)),
        np.asarray(unfused.apply(p_u, x, lengths, False)))


def test_fused_module_end_to_end_interpret():
    """The flax module with fused=True + FORCE_INTERPRET routes through
    the Pallas kernel and matches the XLA path."""
    x, lengths, _, _ = _mk(B=2, T=20, D=128, k=7, seed=4)
    mod = _ConvModule(kernel_size=7, dropout=0.0, norm="layer_norm",
                      dtype=jnp.float32, fused=True)
    params = mod.init(jax.random.PRNGKey(4), x, lengths, False)
    want = _ConvModule(kernel_size=7, dropout=0.0, norm="layer_norm",
                       dtype=jnp.float32, fused=False).apply(
        params, x, lengths, False)
    cp.FORCE_INTERPRET = True
    try:
        got = mod.apply(params, x, lengths, False)
    finally:
        cp.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_supported_predicate():
    assert not cp.supported((4, 100, 64), interpret=True)    # D%128
    assert cp.supported((4, 100, 256), interpret=True)
    # huge T overflows even the R=1 VMEM estimate
    assert not cp.supported((4, 200000, 256), interpret=True)


def test_bf16_smoke():
    x, lengths, mod, params = _mk(B=2, T=16, D=128, k=5, seed=5,
                                  dtype=jnp.bfloat16)
    want = mod.apply(params, x, lengths, False).astype(jnp.float32)
    got = _fused_apply(params, x, lengths).astype(jnp.float32)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.1)


def test_rel_shift_equals_gather():
    """The pad-reshape relative shift (reversed table) must reproduce
    take_along_axis(pos_score, t-j+T-1) exactly — the two forms of the
    Transformer-XL bidirectional position term."""
    B, H, T = 2, 3, 7
    rng = np.random.RandomState(0)
    qw = rng.randn(B, T, H, 5)
    table = rng.randn(2 * T - 1, H, 5)      # row r: distance r-(T-1)

    # reference: score against the table in natural order, then gather
    pos_nat = np.einsum("bthd,rhd->bhtr", qw, table)
    gather = (np.arange(T)[:, None] - np.arange(T)[None, :]) + (T - 1)
    want = np.take_along_axis(pos_nat, gather[None, None], axis=3)

    # shifted: score against the REVERSED table, pad/reshape/slice
    ps = jnp.asarray(np.einsum("bthd,rhd->bhtr", qw, table[::-1]))
    ps = jnp.pad(ps, ((0, 0), (0, 0), (0, 0), (1, 0)))
    ps = ps.reshape(B, H, 2 * T, T)[:, :, 1:, :]
    got = ps.reshape(B, H, T, 2 * T - 1)[:, :, :, :T]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                               atol=1e-8)


def test_flash_attention_flag_falls_back_off_tpu():
    """``flash_attention`` must be a no-op off TPU: same params, same
    outputs bit-for-bit (the kernel itself is measured on chip via
    scripts/probe_conformer_breakdown.py's rel_pos_attention_flash
    piece and BENCH_FLASH=1 on scripts/bench_conformer.py)."""
    from openseq2seq_tpu.encoders.conformer_encoder import \
        RelPosSelfAttention
    assert jax.default_backend() != "tpu"
    rng = np.random.RandomState(1)
    B, T, D, H = 2, 9, 16, 4
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    pad_mask = jnp.asarray([[True] * 9, [True] * 6 + [False] * 3])
    plain = RelPosSelfAttention(num_heads=H, dropout=0.0)
    flash = RelPosSelfAttention(num_heads=H, dropout=0.0, use_flash=True)
    v = plain.init(jax.random.PRNGKey(0), x, pad_mask, False)
    o1 = plain.apply(v, x, pad_mask, False)
    o2 = flash.apply(v, x, pad_mask, False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
