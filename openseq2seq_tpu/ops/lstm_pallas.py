"""Fused Pallas LSTM scan — the recorded LSTM-LM lever.

Motivation (measured, `scripts/probe_lm_breakdown.py` queue21, bs224
bptt96 H1024): the `lax.scan` LSTM stack costs 30.9 ms fwd+bwd against
a 12.1 ms pure-sequential-matmul floor — the 2.5x gap is gate
elementwise + mask/carry traffic that XLA schedules as separate HLOs
per step. This kernel runs the WHOLE recurrence inside one
`pallas_call`: the recurrent weights stay resident in VMEM across all
T steps, gates/mask/carry never leave VMEM, and each step issues
exactly one MXU matmul plus VPU elementwise. The batch is tiled into
``bblk`` rows per grid lane so one step's tiles + the resident W_h fit
the ~16 MB VMEM (grid = (B/bblk, T), T innermost sequential; carries
live in scratch and re-initialize per batch tile).

Backward: a reverse-time kernel over per-step saved activations
(sigmoid/tanh gate values bf16 + f32 cell states) producing dgates and
the initial-state cotangents. Time reversal is pure index arithmetic
in the BlockSpecs (no flipped copies). dW_h and dx_proj fall out
OUTSIDE the kernel (dx_proj = dgates; dW_h = h_prev^T dgates — one
large high-MFU matmul over the T*B contraction). Steps at t >=
length produce exactly zero dgates (the forward's mask carry-through
zeroes both dh_new and dc_new), so the previous-state sequences need
no mask reconstruction.

Contract: identical math to the `lax.scan` in `parts/rnns/rnn.LSTM`
(same x_proj/W_h parameterization, forget-gate bias, length-mask
carry-through); opt-in via the ``fused_rnn`` model param, gated by
`supported()`.

Reference contract: cuDNN fused RNNs (`encoders/ds2_encoder.py:294`,
`lm_encoders.py:10`) — the same persistent-weights fused-cell idea on
the TPU memory hierarchy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to run in interpreter mode on CPU
FORCE_INTERPRET = False

_BUDGET = 11 * 1024 * 1024


def _pick_bblk(B: int, H: int) -> int:
    """Largest divisor of B whose per-step tiles fit the VMEM budget
    next to the resident (H, 4H) weights."""
    wh = H * 4 * H * 2
    for bblk in sorted({d for d in range(1, B + 1) if B % d == 0},
                       reverse=True):
        streams = bblk * 4 * H * 2 * 2 + bblk * H * (2 * 4 + 4)
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
def _fwd_kernel(lens_ref, xp_ref, wh_ref, h0_ref, c0_ref,
                ys_ref, acts_ref, cs_ref, hl_ref, cl_ref,
                h_s, c_s, *, T, forget_bias, suffix_mask):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_s[...] = h0_ref[...].astype(h_s.dtype)
        c_s[...] = c0_ref[...].astype(jnp.float32)

    h = h_s[...]
    c = c_s[...]
    gates = xp_ref[0].astype(jnp.float32) + jax.lax.dot_general(
        h, wh_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bblk, 4H)
    H = h.shape[1]
    si = jax.nn.sigmoid(gates[:, :H])
    sf = jax.nn.sigmoid(gates[:, H:2 * H] + forget_bias)
    tg = jnp.tanh(gates[:, 2 * H:3 * H])
    so = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = sf * c + si * tg
    h_new = so * jnp.tanh(c_new)

    # prefix masking for forward-time LSTMs; suffix masking for the
    # flipped inputs of reverse cells (valid frames sit at the end)
    if suffix_mask:
        m = (t >= T - lens_ref[...]).astype(jnp.float32)
    else:
        m = (t < lens_ref[...]).astype(jnp.float32)      # (bblk, 1)
    h_out = h_new * m + h.astype(jnp.float32) * (1.0 - m)
    c_out = c_new * m + c * (1.0 - m)

    h_s[...] = h_out.astype(h_s.dtype)
    c_s[...] = c_out
    ys_ref[0] = h_out.astype(ys_ref.dtype)
    acts_ref[0] = jnp.concatenate([si, sf, tg, so],
                                  axis=1).astype(acts_ref.dtype)
    cs_ref[0] = c_new

    @pl.when(t == T - 1)
    def _emit():
        hl_ref[...] = h_out.astype(hl_ref.dtype)
        cl_ref[...] = c_out


def _fwd(x_proj_t, wh, h0, c0, lens, bblk, forget_bias, suffix_mask,
         interpret):
    T, B, H4 = x_proj_t.shape
    H = H4 // 4
    dt = x_proj_t.dtype
    nb = B // bblk
    V = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, forget_bias=forget_bias,
                          suffix_mask=suffix_mask),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((bblk, 1), lambda b, t: (b, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H4), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, t: (b, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, t: (b, 0),
                         memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, bblk, H), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H4), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H), lambda b, t: (t, b, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, t: (b, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, t: (b, 0),
                         memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dt),          # ys
            jax.ShapeDtypeStruct((T, B, H4), dt),         # gate acts
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),  # c_new seq
            jax.ShapeDtypeStruct((B, H), dt),             # h_last
            jax.ShapeDtypeStruct((B, H), jnp.float32),    # c_last
        ],
        scratch_shapes=[
            pltpu.VMEM((bblk, H), dt),
            pltpu.VMEM((bblk, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(lens, x_proj_t, wh, h0, c0)


# ---------------------------------------------------------------------------
# backward (reverse time via index maps — no flipped copies)
# ---------------------------------------------------------------------------
def _bwd_kernel(lens_ref, wh_ref, acts_ref, cs_ref, cs_prev_ref,
                c0_ref, dys_ref, dhl_ref, dcl_ref,
                dg_ref, dh0_ref, dc0_ref, dh_s, dc_s, *,
                T, forget_bias, suffix_mask):
    tr = pl.program_id(1)
    t = T - 1 - tr

    @pl.when(tr == 0)
    def _init():
        dh_s[...] = dhl_ref[...].astype(jnp.float32)
        dc_s[...] = dcl_ref[...]

    H = dh_s.shape[1]
    acts = acts_ref[0].astype(jnp.float32)
    si, sf, tg, so = (acts[:, :H], acts[:, H:2 * H],
                      acts[:, 2 * H:3 * H], acts[:, 3 * H:])
    c_new = cs_ref[0]
    # state BEFORE step t: cs[t-1] (the t=0 grid step's block aliases
    # cs[0] via the clamped index map; swap in c0 there)
    c_prev = jnp.where(t == 0, c0_ref[...], cs_prev_ref[0])
    if suffix_mask:
        m = (t >= T - lens_ref[...]).astype(jnp.float32)
    else:
        m = (t < lens_ref[...]).astype(jnp.float32)

    dh = dh_s[...] + dys_ref[0].astype(jnp.float32)
    dc = dc_s[...]
    dh_new = dh * m
    dc_new = dc * m
    tc = jnp.tanh(c_new)
    do = dh_new * tc
    dc_new = dc_new + dh_new * so * (1.0 - tc * tc)
    dgates = jnp.concatenate([
        dc_new * tg * si * (1.0 - si),
        dc_new * c_prev * sf * (1.0 - sf),
        dc_new * si * (1.0 - tg * tg),
        do * so * (1.0 - so),
    ], axis=1)
    dgates_c = dgates.astype(dg_ref.dtype)
    dg_ref[0] = dgates_c
    dh_s[...] = dh * (1.0 - m) + jax.lax.dot_general(
        dgates_c, wh_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dc_s[...] = dc * (1.0 - m) + dc_new * sf

    @pl.when(tr == T - 1)
    def _emit():
        dh0_ref[...] = dh_s[...].astype(dh0_ref.dtype)
        dc0_ref[...] = dc_s[...]


def _bwd(wh, acts, cs, c0, dys_t, dh_last, dc_last, lens, bblk,
         forget_bias, suffix_mask, interpret):
    T, B, H4 = acts.shape
    H = H4 // 4
    dt = acts.dtype
    nb = B // bblk
    V = pltpu.VMEM
    rev = lambda b, tr: (T - 1 - tr, b, 0)               # noqa: E731
    # cs_prev block: original index t-1, clamped at 0 (the t==0 case
    # is replaced by c0 inside the kernel)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, forget_bias=forget_bias,
                          suffix_mask=suffix_mask),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((bblk, 1), lambda b, tr: (b, 0),
                         memory_space=V),
            pl.BlockSpec((H, H4), lambda b, tr: (0, 0),
                         memory_space=V),
            pl.BlockSpec((1, bblk, H4), rev, memory_space=V),
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
            pl.BlockSpec((bblk, H), lambda b, tr: (b, 0),
                         memory_space=V),
        ],
        out_specs=[
            pl.BlockSpec((1, bblk, H4), rev, memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, tr: (b, 0),
                         memory_space=V),
            pl.BlockSpec((bblk, H), lambda b, tr: (b, 0),
                         memory_space=V),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), dt),         # dgates
            jax.ShapeDtypeStruct((B, H), dt),             # dh0
            jax.ShapeDtypeStruct((B, H), jnp.float32),    # dc0
        ],
        scratch_shapes=[
            pltpu.VMEM((bblk, H), jnp.float32),
            pltpu.VMEM((bblk, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(lens, wh, acts, cs, cs, c0, dys_t, dh_last, dc_last)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def lstm_scan(x_proj, wh, h0, c0, lengths, forget_bias=1.0,
              interpret=False, suffix_mask=False):
    """Run the LSTM recurrence over (B, T, 4H) pre-projected inputs.

    Returns (ys (B, T, H), (h_last, c_last)) — identical math to the
    `lax.scan` in parts/rnns/rnn.LSTM (incl. the length-mask
    carry-through of h/c past each row's end)."""
    out, _ = _lstm_fwd_res(x_proj, wh, h0, c0, lengths, forget_bias,
                           interpret, suffix_mask)
    return out


def _lstm_fwd_res(x_proj, wh, h0, c0, lengths, forget_bias, interpret,
                  suffix_mask):
    B, T, H4 = x_proj.shape
    H = H4 // 4
    bblk = _pick_bblk(B, H)
    xp = jnp.moveaxis(x_proj, 1, 0)                      # (T, B, 4H)
    lens = lengths.astype(jnp.int32).reshape(B, 1)
    whc = wh.astype(x_proj.dtype)
    ys, acts, cs, h_last, c_last = _fwd(
        xp, whc, h0.astype(x_proj.dtype),
        c0.astype(jnp.float32), lens, bblk, float(forget_bias),
        suffix_mask, interpret)
    out = (jnp.moveaxis(ys, 0, 1), (h_last, c_last.astype(c0.dtype)))
    res = (whc, acts, cs, ys, h0, c0, lens, bblk)
    return out, res


def _lstm_vjp_fwd(x_proj, wh, h0, c0, lengths, forget_bias, interpret,
                  suffix_mask):
    return _lstm_fwd_res(x_proj, wh, h0, c0, lengths, forget_bias,
                         interpret, suffix_mask)


def _lstm_vjp_bwd(forget_bias, interpret, suffix_mask, res, g):
    whc, acts, cs, ys, h0, c0, lens, bblk = res
    dys_bth, (dh_last, dc_last) = g
    T, B, H = ys.shape
    dt = whc.dtype
    dys = jnp.moveaxis(dys_bth, 1, 0).astype(dt)         # (T, B, H)
    dgates, dh0, dc0 = _bwd(
        whc, acts, cs, c0.astype(jnp.float32), dys,
        dh_last.astype(dt), dc_last.astype(jnp.float32), lens, bblk,
        float(forget_bias), suffix_mask, interpret)
    # large, high-MFU matmuls OUTSIDE the sequential kernel
    h_prev = jnp.concatenate([h0.astype(dt)[None], ys[:-1]], axis=0)
    dx_proj = jnp.moveaxis(dgates, 0, 1)                 # (B, T, 4H)
    dwh = jax.lax.dot_general(
        h_prev.reshape(T * B, H), dgates.reshape(T * B, 4 * H),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(whc.dtype)
    return (dx_proj, dwh, dh0.astype(h0.dtype), dc0.astype(c0.dtype),
            None)


lstm_scan.defvjp(_lstm_vjp_fwd, _lstm_vjp_bwd)
