"""CTC loss as fused Pallas TPU kernels.

The pure-XLA CTC in ``ops/ctc.py`` lowers the alpha recursion to a
``lax.scan`` with T sequential steps — T kernel launches' worth of
per-step overhead for tiny (B, S) updates. Here the whole forward
(alpha) and backward (beta/gamma) recursions run *inside* Pallas
kernels at VMEM speed.

Fusion design (round 2): the kernels consume the (B, T, V) log-softmax
directly. The emission matrix emit[b,t,s] = logprobs[b,t,ext[b,s]] is
materialized only in VMEM, per chunk, via an exact one-hot MXU matmul
(the one-hot weights are 0/1, exactly representable in every MXU pass,
so HIGHEST precision reproduces fp32 bit-for-bit). Compared to round 1
this removes both (B, T, S) fp32 HBM residuals (emit and alphas — 786 MB
at bs256/T=1000/S=384) from the VJP: the only saved tensor is the
(B, T, V) logprobs the model keeps anyway.

  * forward: grid (B/R, T/TC); R=8 batch rows per program (fills the
    VPU's fp32 sublanes), TC-frame logprob chunks streamed from HBM,
    the (R, S) alpha column carried in VMEM scratch across chunks.
    HBM traffic: read B*T*Vp + B*S*Vp instead of B*T*S floats (~5x
    less at Jasper shapes).
  * backward: grid (B/R, T/TC) with the T axis iterated in REVERSE via
    the block index maps; R=8 rows per program. The forward (when taken
    under ``jax.grad``) additionally saves tiny (B, T/TC, S) alpha
    checkpoints at chunk boundaries; the backward recomputes each
    chunk's alphas from its checkpoint into VMEM, runs the beta
    recursion within the chunk (the ``z = beta + emit`` carry crosses
    chunk boundaries in scratch), overwrites the alpha scratch with
    gradients in place, and scatters to (TC, V) with a trailing MXU
    matmul per row.

API-compatible with :func:`openseq2seq_tpu.ops.ctc.ctc_loss` (same
infeasible-row semantics, reference `losses/ctc_loss.py:78-83`);
differentiable via ``jax.custom_vjp``; ``interpret=True`` for CPU
tests. Shapes whose scratch would overflow VMEM fall back to the XLA
scan implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_VMEM_BUDGET = 10 * 1024 * 1024   # leave headroom under the ~16MB/core
_EXACT = jax.lax.Precision.HIGHEST  # 0/1 one-hot weights -> exact gather


def _round_up(x, m):
    return (x + m - 1) // m * m


def _logaddexp(a, b):
    mx = jnp.maximum(jnp.maximum(a, b), NEG)
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


# ---------------------------------------------------------------------------
# forward kernel: emission gather (MXU) + alpha recursion, chunked over T
# ---------------------------------------------------------------------------
def _alpha_kernel(R, TC, with_ckpt, len_ref, extlen_ref, canskip_ref,
                  valid_ref, lp_ref, oht_ref, nll_ref, *rest):
    """Blocks: lp (R, TC, Vp) at (b, tc); oht (R, Vp, S) at (b,) —
    transposed one-hot of the extended label sequence. Full-array VMEM:
    len/extlen/nll (B, 1), canskip/valid (B, S). Scratch: alpha (R, S)
    carried across the T-chunk grid axis, emit (R, TC, S). When
    ``with_ckpt`` (the grad path) the end-of-chunk alpha column is also
    written to a (1, R, S) ckpt block for the chunked backward (the
    ckpt array is (n_tc, B, S) — chunk-major so the (R, S) tail of
    every block meets the TPU (8, 128) tiling constraint)."""
    if with_ckpt:
        ckpt_ref, alpha_scr, emit_scr = rest
    else:
        alpha_scr, emit_scr = rest
    S = oht_ref.shape[2]
    b = pl.program_id(0)
    tc = pl.program_id(1)
    n_tc = pl.num_programs(1)
    row0 = pl.multiple_of(b * R, R)

    length = len_ref[pl.ds(row0, R), :]                    # (R, 1)
    ext_len = extlen_ref[pl.ds(row0, R), :]                # (R, 1)
    can_skip = canskip_ref[pl.ds(row0, R), :]              # (R, S)
    valid = valid_ref[pl.ds(row0, R), :]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)

    # emission gather for this chunk: (TC, Vp) x (Vp, S) per row (exact)
    for r in range(R):
        emit_scr[r] = jnp.dot(lp_ref[r], oht_ref[r],
                              preferred_element_type=jnp.float32,
                              precision=_EXACT)

    @pl.when(tc == 0)
    def _init():
        init_mask = pos <= jnp.minimum(ext_len - 1, 1)
        alpha0 = jnp.where(init_mask, emit_scr[:, 0, :], NEG)
        alpha_scr[:] = jnp.where(valid > 0, alpha0, NEG)

    def step(tt, alpha):
        t = tc * TC + tt
        # dynamic t-slice must hit the scratch REF (Mosaic lowers ref
        # indexing to memory ops; dynamic_slice on values is unsupported)
        emit_t = jnp.where(valid > 0, emit_scr[:, tt, :], NEG)
        shift1 = jnp.where(pos >= 1, pltpu.roll(alpha, 1, 1), NEG)
        shift2 = jnp.where(pos >= 2, pltpu.roll(alpha, 2, 1), NEG)
        cand = _logaddexp(alpha, shift1)
        cand = jnp.where(can_skip > 0, _logaddexp(cand, shift2), cand)
        new = jnp.where(valid > 0, cand + emit_t, NEG)
        new = jnp.where(t < length, new, alpha)            # freeze pads
        new = jnp.where(t == 0, alpha, new)  # t=0 is the init, not a step
        return new

    alpha_scr[:] = jax.lax.fori_loop(0, TC, step, alpha_scr[:])

    if with_ckpt:
        ckpt_ref[0, :, :] = alpha_scr[:]

    @pl.when(tc == n_tc - 1)
    def _finalize():
        alpha_last = alpha_scr[:]
        end_mask = jnp.logical_and(pos >= ext_len - 2, pos <= ext_len - 1)
        score = jnp.where(end_mask, alpha_last, NEG)
        m = jnp.max(score, axis=1, keepdims=True)          # (R, 1)
        lse = m + jnp.log(jnp.sum(jnp.exp(score - m), axis=1,
                                  keepdims=True))
        nll_ref[pl.ds(row0, R), :] = -lse


# ---------------------------------------------------------------------------
# backward kernel: grid (B/R, T/TC) with the chunk axis REVERSED via the
# index maps. Per program: recompute the chunk's alphas from the saved
# chunk-boundary checkpoint, run the beta recursion in reverse (carrying
# z = beta + emit across chunks in scratch), overwrite the alpha scratch
# with gamma-gradients in place, vocab-scatter on the MXU.
# ---------------------------------------------------------------------------
def _beta_chunk_kernel(R, TC, len_ref, extlen_ref, nll_ref, canskip_ref,
                       valid_ref, ckpt_ref, lp_ref, oht_ref, dlp_ref,
                       emit_scr, ag_scr, z_scr):
    """Blocks: lp/dlp (R, TC, Vp) at (b, rev(tc)); oht (R, Vp, S) at
    (b,); ckpt (1, R, S) at (rev(tc)-1, b) — the alpha column at the END
    of the PREVIOUS chunk. Scratch: emit/ag (R, TC, S), z (R, S) carried
    across the chunk grid axis (valid until the b row-block changes,
    where tc==0 reinitializes it)."""
    S = oht_ref.shape[2]
    b = pl.program_id(0)
    tc = pl.program_id(1)              # 0 == LAST chunk (reversed maps)
    n_tc = pl.num_programs(1)
    rc = n_tc - 1 - tc                 # real chunk index
    Tp = n_tc * TC
    row0 = pl.multiple_of(b * R, R)

    length = len_ref[pl.ds(row0, R), :]                    # (R, 1)
    ext_len = extlen_ref[pl.ds(row0, R), :]
    logz = -nll_ref[pl.ds(row0, R), :]
    can_skip = canskip_ref[pl.ds(row0, R), :]              # (R, S)
    valid = valid_ref[pl.ds(row0, R), :]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)

    # emission gather for this chunk (exact one-hot MXU matmuls)
    for r in range(R):
        emit_scr[r] = jnp.dot(lp_ref[r], oht_ref[r],
                              preferred_element_type=jnp.float32,
                              precision=_EXACT)

    def emit_at(tt):
        return jnp.where(valid > 0, emit_scr[:, tt, :], NEG)

    # ---- pass 1: recompute this chunk's alphas from the checkpoint ----
    init_mask = pos <= jnp.minimum(ext_len - 1, 1)

    def fwd_step(tt, alpha):
        t = rc * TC + tt
        emit_t = emit_at(tt)
        shift1 = jnp.where(pos >= 1, pltpu.roll(alpha, 1, 1), NEG)
        shift2 = jnp.where(pos >= 2, pltpu.roll(alpha, 2, 1), NEG)
        cand = _logaddexp(alpha, shift1)
        cand = jnp.where(can_skip > 0, _logaddexp(cand, shift2), cand)
        new = jnp.where(valid > 0, cand + emit_t, NEG)
        new = jnp.where(t < length, new, alpha)            # freeze pads
        alpha0 = jnp.where(jnp.logical_and(init_mask, valid > 0),
                           emit_t, NEG)
        new = jnp.where(t == 0, alpha0, new)               # t=0 is init
        ag_scr[:, pl.ds(tt, 1), :] = new[:, None, :]
        return new

    jax.lax.fori_loop(0, TC, fwd_step, ckpt_ref[0, :, :])

    # ---- pass 2: beta recursion, gradients overwrite ag_scr ----
    can_skip_fwd = pltpu.roll(can_skip, S - 2, 1)
    can_skip_fwd = jnp.where(pos < S - 2, can_skip_fwd, 0.0)
    end_mask = jnp.logical_and(pos >= ext_len - 2, pos <= ext_len - 1)
    beta_T = jnp.where(end_mask, 0.0, NEG)

    def write_grad(tt, beta, t):
        gamma = ag_scr[:, tt, :] + beta - logz
        g = -jnp.exp(jnp.maximum(gamma, -80.0))
        g = jnp.where(valid > 0, g, 0.0)
        g = jnp.where(t < length, g, 0.0)
        ag_scr[:, pl.ds(tt, 1), :] = g[:, None, :]

    @pl.when(tc == 0)
    def _init_last():
        # the global last step t = Tp-1: no successor
        beta_last = jnp.where(length == Tp, beta_T, NEG)
        write_grad(TC - 1, beta_last, Tp - 1)
        z_scr[:] = beta_last + emit_at(TC - 1)

    def bwd_step(i, z):
        tt = TC - 1 - i
        t = rc * TC + tt
        # z == beta_{t+1} + emit_{t+1} (carried across chunks)
        shift1 = jnp.where(pos < S - 1, pltpu.roll(z, S - 1, 1), NEG)
        shift2 = jnp.where(pos < S - 2, pltpu.roll(z, S - 2, 1), NEG)
        cand = _logaddexp(z, shift1)
        cand = jnp.where(can_skip_fwd > 0, _logaddexp(cand, shift2),
                         cand)
        beta_t = jnp.where(valid > 0, cand, NEG)
        beta_t = jnp.where(t == length - 1, beta_T, beta_t)
        beta_t = jnp.where(t < length, beta_t, NEG)
        write_grad(tt, beta_t, t)
        return beta_t + emit_at(tt)

    # tc==0 already consumed its first reverse step in _init_last
    start = jnp.where(tc == 0, 1, 0)
    z_scr[:] = jax.lax.fori_loop(start, TC, bwd_step, z_scr[:])

    # ---- vocab scatter: (TC, S) x (S, Vp), contraction on S ----
    for r in range(R):
        dlp_ref[r] = jax.lax.dot_general(
            ag_scr[r], oht_ref[r],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT)


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------
def _prep(logprobs, labels, label_lengths, blank_id):
    """Small host-side tensors: padded transposed one-hot (B, Vp, S) of
    the extended (blank-interleaved) label sequence, skip/valid masks,
    extended lengths, and the Vp-padded logprobs."""
    B, T, V = logprobs.shape
    L = labels.shape[1]
    S = _round_up(2 * L + 1, 128)
    Vp = _round_up(V, 128)

    s_idx = jnp.arange(S)
    is_label = jnp.logical_and((s_idx % 2) == 1, s_idx < 2 * L + 1)
    label_idx = jnp.clip((s_idx - 1) // 2, 0, L - 1)
    ext = jnp.where(is_label[None, :], labels[:, label_idx], blank_id)
    ext_m2 = jnp.concatenate(
        [jnp.full((B, 2), blank_id, ext.dtype), ext[:, :-2]], axis=1)
    can_skip = (is_label[None, :] & (ext != ext_m2) &
                (s_idx >= 2)[None, :]).astype(jnp.float32)
    ext_len = 2 * label_lengths + 1
    valid = (s_idx[None, :] < ext_len[:, None]).astype(jnp.float32)

    # (B, Vp, S) one-hot, transposed for the in-kernel gather matmul
    oht = (ext[:, None, :] ==
           jnp.arange(Vp, dtype=ext.dtype)[None, :, None]
           ).astype(jnp.float32)
    lp_pad = logprobs if Vp == V else jnp.pad(
        logprobs, ((0, 0), (0, 0), (0, Vp - V)))
    return lp_pad, oht, can_skip, valid, ext_len, S, Vp


def _col(x):
    return x.astype(jnp.int32)[:, None]


def _scalar_spec(B):
    return pl.BlockSpec((B, 1), lambda *_: (0, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec(B, S):
    return pl.BlockSpec((B, S), lambda *_: (0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_chunks(T):
    """(T_padded, TC): chunk T into sublane-aligned pieces."""
    if T <= 128:
        tp = _round_up(T, 8)
        return tp, tp
    return _round_up(T, 128), 128


def _fits_vmem_fwd(R, TC, S, Vp):
    # double-buffered lp blocks + oht block + emit/alpha scratch
    need = 2 * R * TC * Vp * 4 + 2 * R * Vp * S * 4 + \
        R * TC * S * 4 + R * S * 4
    return need <= _VMEM_BUDGET


def _pick_r(B, fits):
    for r in (8, 4, 2):
        if B % r == 0 and fits(r):
            return r
    return 1


def _fits_vmem_bwd(R, TC, S, Vp):
    # lp + dlp blocks (double-buffered) + oht (dbuf) + ckpt + scratch
    need = (4 * R * TC * Vp * 4 + 2 * R * Vp * S * 4 +
            2 * R * S * 4 + 2 * R * TC * S * 4 + R * S * 4)
    return need <= _VMEM_BUDGET


def _run_forward(lp_pad, oht, can_skip, valid, logit_lengths, ext_len,
                 interpret, with_ckpt=False):
    """Forward NLL; with ``with_ckpt`` also returns the (B, n_tc, S)
    end-of-chunk alpha checkpoints consumed by the chunked backward."""
    B, T, Vp = lp_pad.shape
    S = oht.shape[2]
    Tp, TC = _fwd_chunks(T)
    if Tp != T:
        lp_pad = jnp.pad(lp_pad, ((0, 0), (0, Tp - T), (0, 0)))
    n_tc = Tp // TC
    R = _pick_r(B, lambda r: _fits_vmem_fwd(r, TC, S, Vp))
    out_shape = [jax.ShapeDtypeStruct((B, 1), jnp.float32)]
    out_specs = [_scalar_spec(B)]
    if with_ckpt:
        out_shape.append(jax.ShapeDtypeStruct((n_tc, B, S), jnp.float32))
        out_specs.append(pl.BlockSpec((1, R, S), lambda b, tc: (tc, b, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_alpha_kernel, R, TC, with_ckpt),
        grid=(B // R, n_tc),
        in_specs=[
            _scalar_spec(B), _scalar_spec(B),
            _mask_spec(B, S), _mask_spec(B, S),
            pl.BlockSpec((R, TC, Vp), lambda b, tc: (b, tc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Vp, S), lambda b, tc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_ckpt else out_specs[0],
        out_shape=out_shape if with_ckpt else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((R, S), jnp.float32),
            pltpu.VMEM((R, TC, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(_col(logit_lengths), _col(ext_len), can_skip, valid, lp_pad, oht)
    if with_ckpt:
        return out[0][:, 0], out[1]
    return out[:, 0]


def _run_backward(lp_pad, oht, can_skip, valid, logit_lengths, ext_len,
                  nll, ckpt, interpret):
    B, T, Vp = lp_pad.shape
    S = oht.shape[2]
    Tp, TC = _fwd_chunks(T)
    if Tp != T:
        lp_pad = jnp.pad(lp_pad, ((0, 0), (0, Tp - T), (0, 0)))
    n_tc = Tp // TC
    R = _pick_r(B, lambda r: _fits_vmem_bwd(r, TC, S, Vp))

    def rev(tc):
        return n_tc - 1 - tc

    dlp = pl.pallas_call(
        functools.partial(_beta_chunk_kernel, R, TC),
        grid=(B // R, n_tc),
        in_specs=[
            _scalar_spec(B), _scalar_spec(B), _scalar_spec(B),
            _mask_spec(B, S), _mask_spec(B, S),
            # alpha at the end of the PREVIOUS chunk (rc==0 loads chunk
            # 0 and ignores it — t==0 re-initializes in-kernel)
            pl.BlockSpec(
                (1, R, S),
                lambda b, tc: (jnp.maximum(rev(tc) - 1, 0), b, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((R, TC, Vp), lambda b, tc: (b, rev(tc), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Vp, S), lambda b, tc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, TC, Vp), lambda b, tc: (b, rev(tc), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Vp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, TC, S), jnp.float32),
            pltpu.VMEM((R, TC, S), jnp.float32),
            pltpu.VMEM((R, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(_col(logit_lengths), _col(ext_len),
      nll[:, None].astype(jnp.float32), can_skip, valid, ckpt, lp_pad,
      oht)
    return dlp[:, :T, :]


# ---------------------------------------------------------------------------
# custom VJP: the only large residual is the (B, T, V) logprobs
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ctc_nll_from_logprobs(logprobs, logit_lengths, labels,
                           label_lengths, blank_id, interpret):
    """(B,) negative log likelihood from log-softmax probabilities."""
    lp_pad, oht, can_skip, valid, ext_len, _, _ = _prep(
        logprobs, labels, label_lengths, blank_id)
    return _run_forward(lp_pad, oht, can_skip, valid, logit_lengths,
                        ext_len, interpret)


def _ctc_fwd(logprobs, logit_lengths, labels, label_lengths, blank_id,
             interpret):
    lp_pad, oht, can_skip, valid, ext_len, _, _ = _prep(
        logprobs, labels, label_lengths, blank_id)
    nll, ckpt = _run_forward(lp_pad, oht, can_skip, valid, logit_lengths,
                             ext_len, interpret, with_ckpt=True)
    return nll, (logprobs, logit_lengths, labels, label_lengths, nll,
                 ckpt)


def _ctc_bwd(blank_id, interpret, res, g):
    logprobs, logit_lengths, labels, label_lengths, nll, ckpt = res
    V = logprobs.shape[2]
    lp_pad, oht, can_skip, valid, ext_len, _, _ = _prep(
        logprobs, labels, label_lengths, blank_id)
    dlp = _run_backward(lp_pad, oht, can_skip, valid, logit_lengths,
                        ext_len, nll, ckpt, interpret)
    dlogprobs = dlp[:, :, :V] * g[:, None, None]
    return (dlogprobs, None, None, None)


_ctc_nll_from_logprobs.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_pallas(logits, logit_lengths, labels, label_lengths,
                    blank_id: int = -1,
                    ignore_longer_outputs_than_inputs: bool = True,
                    average_across_batch: bool = True,
                    interpret: bool = False):
    """Drop-in replacement for :func:`ops.ctc.ctc_loss` backed by the
    fused Pallas kernels. ``interpret=True`` runs the kernels in
    interpreter mode (for CPU tests). Shapes whose per-row scratch
    would overflow VMEM fall back to the XLA scan implementation."""
    B, T, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    L = labels.shape[1]
    S = _round_up(2 * L + 1, 128)
    Vp = _round_up(V, 128)
    # use_pallas is a shipped default in the flagship recipes; on
    # non-TPU backends (CPU tests, GPU) compiled Pallas is unavailable,
    # so silently use the equivalent XLA scan implementation instead of
    # forcing interpret mode (hundreds of times slower)
    if not interpret and jax.default_backend() != "tpu":
        from .ctc import ctc_loss
        return ctc_loss(
            logits, logit_lengths, labels, label_lengths,
            blank_id=blank_id,
            ignore_longer_outputs_than_inputs=(
                ignore_longer_outputs_than_inputs),
            average_across_batch=average_across_batch)
    if not (_fits_vmem_bwd(1, _fwd_chunks(T)[1], S, Vp) and
            _fits_vmem_fwd(1, _fwd_chunks(T)[1], S, Vp)):
        from .ctc import ctc_loss
        return ctc_loss(
            logits, logit_lengths, labels, label_lengths,
            blank_id=blank_id,
            ignore_longer_outputs_than_inputs=(
                ignore_longer_outputs_than_inputs),
            average_across_batch=average_across_batch)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = _ctc_nll_from_logprobs(logprobs, logit_lengths, labels,
                                 label_lengths, blank_id, interpret)
    if ignore_longer_outputs_than_inputs:
        lbl_prev = jnp.concatenate(
            [jnp.full((B, 1), -1, labels.dtype), labels[:, :-1]], axis=1)
        in_range = jnp.arange(L)[None, :] < label_lengths[:, None]
        repeats = jnp.sum((labels == lbl_prev) & in_range, axis=1)
        feasible = logit_lengths >= (label_lengths + repeats)
        nll = jnp.where(feasible, nll, 0.0)
        nll = jnp.where(feasible, nll, jax.lax.stop_gradient(nll))
    if average_across_batch:
        return jnp.mean(nll)
    return nll
