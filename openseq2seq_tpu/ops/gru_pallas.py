"""Fused Pallas GRU scan — the DS2-family companion of
`ops/lstm_pallas.py` (same motivation and structure; see that module's
docstring for the measured scan-vs-floor analysis that motivated both).

Gate math matches `parts/rnns/rnn.GRU` (the cuDNN variant: the reset
gate multiplies the H-side candidate term):

    hp = h @ W_h + b_h                      (B, 3H)
    r = sigmoid(xr + hr);  z = sigmoid(xz + hz)
    n = tanh(xn + r * hn)
    h_new = (1 - z) * n + z * h
    h_out = m * h_new + (1 - m) * h         (length-mask carry-through)

Backward (reverse time), with saved acts = [r, z, n] and the raw
H-side candidate term hn:

    dh_new = m * dh ;  carry = (1 - m) * dh
    dz = dh_new (h_prev - n);  dn_pre = dh_new (1 - z)(1 - n^2)
    dr_pre = dn_pre * hn * r (1 - r);  dz_pre = dz * z (1 - z)
    dx[t] = [dr_pre, dz_pre, dn_pre]
    dhp   = [dr_pre, dz_pre, dn_pre * r]
    dh_prev = carry + dh_new * z + dhp @ W_h^T

dW_h and db_h fall out OUTSIDE the kernel from dx and the saved r
(dhp is dx with its last third scaled by r): one large high-MFU
matmul h_prev^T dhp plus a sum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FORCE_INTERPRET = False

_BUDGET = 11 * 1024 * 1024


def _pick_bblk(B: int, H: int) -> int:
    wh = H * 3 * H * 2
    for bblk in sorted({d for d in range(1, B + 1) if B % d == 0},
                       reverse=True):
        streams = bblk * 3 * H * 2 * 2 + bblk * H * 2 * 4
        if wh + 2 * streams + bblk * H * 8 <= _BUDGET:
            return bblk
    return 0


def supported(B: int, T: int, H: int, interpret: bool = False) -> bool:
    if H % 128 != 0 or B < 8:
        return False
    bblk = _pick_bblk(B, H)
    if bblk == 0 or bblk % 8 != 0:
        return False
    return interpret or jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(lens_ref, xp_ref, wh_ref, bh_ref, h0_ref,
                ys_ref, acts_ref, hn_ref, hl_ref,
                h_s, *, T, suffix_mask):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_s[...] = h0_ref[...].astype(h_s.dtype)

    h = h_s[...]
    hp = jax.lax.dot_general(
        h, wh_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bh_ref[...]  # (bblk, 3H)
    xp = xp_ref[0].astype(jnp.float32)
    H = h.shape[1]
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H:2 * H] + hp[:, H:2 * H])
    hn = hp[:, 2 * H:]
    n = jnp.tanh(xp[:, 2 * H:] + r * hn)
    h32 = h.astype(jnp.float32)
    h_new = (1.0 - z) * n + z * h32

    if suffix_mask:
        m = (t >= T - lens_ref[...]).astype(jnp.float32)
    else:
        m = (t < lens_ref[...]).astype(jnp.float32)
    h_out = h_new * m + h32 * (1.0 - m)

    h_s[...] = h_out.astype(h_s.dtype)
    ys_ref[0] = h_out.astype(ys_ref.dtype)
    acts_ref[0] = jnp.concatenate([r, z, n],
                                  axis=1).astype(acts_ref.dtype)
    hn_ref[0] = hn.astype(hn_ref.dtype)

    @pl.when(t == T - 1)
    def _emit():
        hl_ref[...] = h_out.astype(hl_ref.dtype)


def _fwd(x_proj_t, wh, bh, h0, lens, bblk, suffix_mask, interpret):
    T, B, H3 = x_proj_t.shape
    H = H3 // 3
    dt = x_proj_t.dtype
    nb = B // bblk
    V = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, suffix_mask=suffix_mask),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((bblk, 1), lambda b, t: (b, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H3), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((H, H3), lambda b, t: (0, 0),
                         memory_space=V),
            pl.BlockSpec((1, H3), lambda b, t: (0, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, t: (b, 0),
                         memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, bblk, H), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H3), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, t: (b, 0),
                         memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dt),          # ys
            jax.ShapeDtypeStruct((T, B, H3), dt),         # r,z,n
            jax.ShapeDtypeStruct((T, B, H), dt),          # hn term
            jax.ShapeDtypeStruct((B, H), dt),             # h_last
        ],
        scratch_shapes=[pltpu.VMEM((bblk, H), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(lens, x_proj_t, wh, bh, h0)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _bwd_kernel(lens_ref, wh_ref, acts_ref, hn_ref, hprev_ref,
                h0_ref, dys_ref, dhl_ref,
                dx_ref, dh0_ref, dh_s, *, T, suffix_mask):
    tr = pl.program_id(1)
    t = T - 1 - tr

    @pl.when(tr == 0)
    def _init():
        dh_s[...] = dhl_ref[...].astype(jnp.float32)

    H = dh_s.shape[1]
    acts = acts_ref[0].astype(jnp.float32)
    r, z, n = acts[:, :H], acts[:, H:2 * H], acts[:, 2 * H:]
    hn = hn_ref[0].astype(jnp.float32)
    h_prev = jnp.where(t == 0, h0_ref[...],
                       hprev_ref[0]).astype(jnp.float32)
    if suffix_mask:
        m = (t >= T - lens_ref[...]).astype(jnp.float32)
    else:
        m = (t < lens_ref[...]).astype(jnp.float32)

    dh = dh_s[...] + dys_ref[0].astype(jnp.float32)
    dh_new = dh * m
    dz = dh_new * (h_prev - n)
    dn_pre = dh_new * (1.0 - z) * (1.0 - n * n)
    dr_pre = dn_pre * hn * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dhp = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)
    dh_s[...] = (dh * (1.0 - m) + dh_new * z +
                 jax.lax.dot_general(
                     dhp.astype(wh_ref.dtype), wh_ref[...],
                     (((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.float32))

    @pl.when(tr == T - 1)
    def _emit():
        dh0_ref[...] = dh_s[...].astype(dh0_ref.dtype)


def _bwd(wh, acts, hn, ys, h0, dys_t, dh_last, lens, bblk,
         suffix_mask, interpret):
    T, B, H3 = acts.shape
    H = H3 // 3
    dt = acts.dtype
    nb = B // bblk
    V = pltpu.VMEM
    rev = lambda b, tr: (T - 1 - tr, b, 0)               # noqa: E731
    return pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, suffix_mask=suffix_mask),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((bblk, 1), lambda b, tr: (b, 0),
                         memory_space=V),
            pl.BlockSpec((H, H3), lambda b, tr: (0, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H3), rev, memory_space=V),
            pl.BlockSpec((1, bblk, H), rev, memory_space=V),
            pl.BlockSpec((1, bblk, H),
                         lambda b, tr: (jnp.maximum(T - 2 - tr, 0),
                                        b, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, tr: (b, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H), rev, memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, tr: (b, 0),
                         memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, bblk, H3), rev, memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, tr: (b, 0),
                         memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), dt),         # dx
            jax.ShapeDtypeStruct((B, H), dt),             # dh0
        ],
        scratch_shapes=[pltpu.VMEM((bblk, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(lens, wh, acts, hn, ys, h0, dys_t, dh_last)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_scan(x_proj, wh, bh, h0, lengths, interpret=False,
             suffix_mask=False):
    """Run the GRU recurrence over (B, T, 3H) pre-projected inputs.
    Returns (ys (B, T, H), h_last) — identical math to the scan in
    parts/rnns/rnn.GRU."""
    out, _ = _gru_fwd_res(x_proj, wh, bh, h0, lengths, interpret,
                          suffix_mask)
    return out


def _gru_fwd_res(x_proj, wh, bh, h0, lengths, interpret, suffix_mask):
    B, T, H3 = x_proj.shape
    H = H3 // 3
    bblk = _pick_bblk(B, H)
    xp = jnp.moveaxis(x_proj, 1, 0)
    lens = lengths.astype(jnp.int32).reshape(B, 1)
    whc = wh.astype(x_proj.dtype)
    bhc = bh.astype(jnp.float32).reshape(1, H3)
    ys, acts, hn, h_last = _fwd(xp, whc, bhc,
                                h0.astype(x_proj.dtype), lens, bblk,
                                suffix_mask, interpret)
    out = (jnp.moveaxis(ys, 0, 1), h_last)
    res = (whc, acts, hn, ys, h0, lens, bblk)
    return out, res


def _gru_vjp_fwd(x_proj, wh, bh, h0, lengths, interpret, suffix_mask):
    return _gru_fwd_res(x_proj, wh, bh, h0, lengths, interpret,
                        suffix_mask)


def _gru_vjp_bwd(interpret, suffix_mask, res, g):
    whc, acts, hn, ys, h0, lens, bblk = res
    dys_bth, dh_last = g
    T, B, H = ys.shape
    dt = whc.dtype
    dys = jnp.moveaxis(dys_bth, 1, 0).astype(dt)
    dx_t, dh0 = _bwd(whc, acts, hn, ys, h0.astype(dt), dys,
                     dh_last.astype(dt), lens, bblk, suffix_mask,
                     interpret)
    dx_proj = jnp.moveaxis(dx_t, 0, 1)                   # (B, T, 3H)
    # dhp = dx with the candidate third scaled by r (see module doc)
    r = acts[..., :H].astype(jnp.float32)
    dx32 = dx_t.astype(jnp.float32)
    dhp = jnp.concatenate([dx32[..., :2 * H],
                           dx32[..., 2 * H:] * r], axis=-1)
    h_prev = jnp.concatenate([h0.astype(dt)[None], ys[:-1]], axis=0)
    dwh = jax.lax.dot_general(
        h_prev.reshape(T * B, H).astype(jnp.float32),
        dhp.reshape(T * B, 3 * H),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(whc.dtype)
    dbh = jnp.sum(dhp, axis=(0, 1))
    return (dx_proj, dwh, dbh, dh0.astype(h0.dtype), None)


gru_scan.defvjp(_gru_vjp_fwd, _gru_vjp_bwd)
