"""CTC loss as Pallas TPU kernels.

The pure-XLA CTC in ``ops/ctc.py`` lowers the alpha recursion to a
``lax.scan`` with T sequential steps — T kernel launches' worth of
per-step overhead for tiny (B, S) updates. Here the whole forward
(alpha) and backward (beta/gamma) recursions run *inside* single Pallas
kernels: each program owns R batch rows (R chosen to fill the VPU's 8
sublanes within the VMEM budget), the (R, S) state lives in VMEM, and
each time step is a handful of VPU ops (roll + logaddexp + add), so the
loop runs at register/VMEM speed with no inter-step launch cost.

Layout: label positions are padded to a multiple of 128 lanes; the
emission matrix (B, T, S) is gathered outside the kernel (one XLA
gather) and streamed in per-program; the vocab scatter of the gradient
is one (T,S)x(S,V) MXU matmul outside the kernel.

API-compatible with :func:`openseq2seq_tpu.ops.ctc.ctc_loss` (same
infeasible-row semantics); differentiable via ``jax.custom_vjp``.
Falls back cleanly under ``interpret=True`` for CPU tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_VMEM_BUDGET = 6 * 1024 * 1024    # blocks are double-buffered across
                                  # grid steps: budget = ~16MB / 2 - slack


def _round_up(x, m):
    return (x + m - 1) // m * m


def _rows_per_program(B, T, S, arrays):
    """Largest R dividing B whose blocks fit the budget; ``arrays`` =
    number of (R,T,S) fp32 buffers resident at once.

    R must be a multiple of 8 (the fp32 sublane count) or exactly 1:
    the kernels slice full-array (B, S) refs at row offset
    ``program_id * R``, and Mosaic rejects dynamic dim-0 indices it
    cannot prove are 8-aligned ("cannot statically prove that index in
    dimension 0 is a multiple of 8") — single-row slices lower through
    a different path and are fine."""
    for r in (32, 16, 8):
        if B % r == 0 and arrays * r * T * S * 4 <= _VMEM_BUDGET:
            return r
    return 1


def _logaddexp(a, b):
    mx = jnp.maximum(jnp.maximum(a, b), NEG)
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


# ---------------------------------------------------------------------------
# forward kernel: alpha recursion over R batch rows per program
# ---------------------------------------------------------------------------
def _alpha_kernel(R, len_ref, extlen_ref, emit_ref, can_skip_ref,
                  valid_ref, alphas_ref, nll_ref):
    """emit (R, T, S); len/extlen (B, 1) int32 VMEM; masks (B, S);
    alphas out (R, T, S); nll out (B, 1) fp32 VMEM."""
    T = emit_ref.shape[1]
    S = emit_ref.shape[2]
    b = pl.program_id(0)
    row0 = b * R
    length = len_ref[pl.ds(row0, R), :]                    # (R, 1)
    ext_len = extlen_ref[pl.ds(row0, R), :]                # (R, 1)
    can_skip = can_skip_ref[pl.ds(row0, R), :]             # (R, S)
    valid = valid_ref[pl.ds(row0, R), :]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)

    # t = 0: alpha = emit[0] at s in {0, 1}, else -inf
    init_mask = pos <= jnp.minimum(ext_len - 1, 1)
    alpha0 = jnp.where(init_mask, emit_ref[:, 0, :], NEG)
    alpha0 = jnp.where(valid > 0, alpha0, NEG)
    alphas_ref[:, 0, :] = alpha0

    def step(t, alpha):
        emit_t = emit_ref[:, t, :]
        shift1 = jnp.where(pos >= 1, pltpu.roll(alpha, 1, 1), NEG)
        shift2 = jnp.where(pos >= 2, pltpu.roll(alpha, 2, 1), NEG)
        cand = _logaddexp(alpha, shift1)
        cand = jnp.where(can_skip > 0, _logaddexp(cand, shift2), cand)
        new = jnp.where(valid > 0, cand + emit_t, NEG)
        new = jnp.where(t < length, new, alpha)            # freeze pads
        alphas_ref[:, t, :] = new
        return new

    alpha_last = jax.lax.fori_loop(1, T, step, alpha0)

    end_mask = jnp.logical_and(pos >= ext_len - 2, pos <= ext_len - 1)
    score = jnp.where(end_mask, alpha_last, NEG)
    m = jnp.max(score, axis=1, keepdims=True)              # (R, 1)
    lse = m + jnp.log(jnp.sum(jnp.exp(score - m), axis=1,
                              keepdims=True))
    nll_ref[pl.ds(row0, R), :] = -lse


# ---------------------------------------------------------------------------
# backward kernel: beta-hat recursion -> gamma = alpha + beta - logZ
# ---------------------------------------------------------------------------
def _beta_kernel(R, len_ref, extlen_ref, nll_ref, emit_ref, can_skip_ref,
                 valid_ref, alphas_ref, grad_ref):
    T = emit_ref.shape[1]
    S = emit_ref.shape[2]
    b = pl.program_id(0)
    row0 = b * R
    length = len_ref[pl.ds(row0, R), :]                    # (R, 1)
    ext_len = extlen_ref[pl.ds(row0, R), :]
    logz = -nll_ref[pl.ds(row0, R), :]                     # (R, 1)
    can_skip = can_skip_ref[pl.ds(row0, R), :]
    valid = valid_ref[pl.ds(row0, R), :]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    # skip transition INTO s+2 is allowed when can_skip[s+2]
    can_skip_fwd = pltpu.roll(can_skip, S - 2, 1)
    can_skip_fwd = jnp.where(pos < S - 2, can_skip_fwd, 0.0)

    # terminal beta at the last ACTIVE frame (t = length-1)
    end_mask = jnp.logical_and(pos >= ext_len - 2, pos <= ext_len - 1)
    beta_T = jnp.where(end_mask, 0.0, NEG)

    def write_grad(t, beta):
        gamma = alphas_ref[:, t, :] + beta - logz
        g = -jnp.exp(jnp.maximum(gamma, -80.0))
        g = jnp.where(valid > 0, g, 0.0)
        g = jnp.where(t < length, g, 0.0)
        grad_ref[:, t, :] = g

    write_grad(T - 1, jnp.where(length == T, beta_T, NEG))
    # for padded frames t >= length, grad is 0 (handled in write_grad)

    def step(i, beta):
        t = T - 2 - i
        nxt = beta + emit_ref[:, t + 1, :]
        shift1 = jnp.where(pos < S - 1, pltpu.roll(nxt, S - 1, 1), NEG)
        shift2 = jnp.where(pos < S - 2, pltpu.roll(nxt, S - 2, 1), NEG)
        cand = _logaddexp(nxt, shift1)
        cand = jnp.where(can_skip_fwd > 0, _logaddexp(cand, shift2),
                         cand)
        beta_t = jnp.where(valid > 0, cand, NEG)
        beta_t = jnp.where(t == length - 1, beta_T, beta_t)
        beta_t = jnp.where(t < length, beta_t, NEG)
        write_grad(t, beta_t)
        return beta_t

    jax.lax.fori_loop(0, T - 1, step,
                      jnp.where(length == T, beta_T, NEG))


# ---------------------------------------------------------------------------
# host-side wrapper with custom VJP
# ---------------------------------------------------------------------------
def _prep(logprobs, logit_lengths, labels, label_lengths, blank_id):
    B, T, V = logprobs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    S_pad = _round_up(S, 128)

    s_idx = jnp.arange(S_pad)
    is_label = jnp.logical_and((s_idx % 2) == 1, s_idx < S)
    label_idx = jnp.clip((s_idx - 1) // 2, 0, L - 1)
    ext = jnp.where(is_label[None, :], labels[:, label_idx], blank_id)
    ext_m2 = jnp.concatenate(
        [jnp.full((B, 2), blank_id, ext.dtype), ext[:, :-2]], axis=1)
    can_skip = (is_label[None, :] & (ext != ext_m2) &
                (s_idx >= 2)[None, :]).astype(jnp.float32)
    ext_len = 2 * label_lengths + 1
    valid = (s_idx[None, :] < ext_len[:, None]).astype(jnp.float32)

    emit = jnp.take_along_axis(
        logprobs, ext[:, None, :].repeat(T, axis=1), axis=2)
    emit = jnp.where(valid[:, None, :] > 0, emit, NEG)
    onehot_ext = jax.nn.one_hot(ext, V, dtype=jnp.float32) * \
        valid[:, :, None]                                  # (B, S_pad, V)
    return emit, can_skip, valid, ext_len, onehot_ext, S_pad


def _scalar_specs(B):
    return pl.BlockSpec((B, 1), lambda b: (0, 0),
                        memory_space=pltpu.VMEM)


def _run_forward(emit, can_skip, valid, logit_lengths, ext_len,
                 interpret):
    B, T, S = emit.shape
    R = _rows_per_program(B, T, S, arrays=2)
    alphas, nll = pl.pallas_call(
        functools.partial(_alpha_kernel, R),
        grid=(B // R,),
        in_specs=[
            _scalar_specs(B),
            _scalar_specs(B),
            pl.BlockSpec((R, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _scalar_specs(B),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, S), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(logit_lengths.astype(jnp.int32)[:, None],
      ext_len.astype(jnp.int32)[:, None], emit, can_skip, valid)
    return alphas, nll[:, 0]


def _run_backward(emit, can_skip, valid, logit_lengths, ext_len, nll,
                  alphas, interpret):
    B, T, S = emit.shape
    # R > 1 currently trips a Mosaic compiler crash in the reverse
    # loop; R = 1 is validated on hardware (and already beats the XLA
    # scan on the grad path)
    R = 1
    grad = pl.pallas_call(
        functools.partial(_beta_kernel, R),
        grid=(B // R,),
        in_specs=[
            _scalar_specs(B),
            _scalar_specs(B),
            _scalar_specs(B),
            pl.BlockSpec((R, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, T, S), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, S), jnp.float32),
        interpret=interpret,
    )(logit_lengths.astype(jnp.int32)[:, None],
      ext_len.astype(jnp.int32)[:, None], nll[:, None], emit, can_skip,
      valid, alphas)
    return grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ctc_nll_from_logprobs(logprobs, logit_lengths, labels,
                           label_lengths, blank_id, interpret):
    """(B,) negative log likelihood from log-softmax probabilities."""
    emit, can_skip, valid, ext_len, _, _ = _prep(
        logprobs, logit_lengths, labels, label_lengths, blank_id)
    _, nll = _run_forward(emit, can_skip, valid, logit_lengths, ext_len,
                          interpret)
    return nll


def _ctc_fwd(logprobs, logit_lengths, labels, label_lengths, blank_id,
             interpret):
    emit, can_skip, valid, ext_len, onehot_ext, _ = _prep(
        logprobs, logit_lengths, labels, label_lengths, blank_id)
    alphas, nll = _run_forward(emit, can_skip, valid, logit_lengths,
                               ext_len, interpret)
    res = (emit, can_skip, valid, ext_len, onehot_ext, logit_lengths,
           nll, alphas)
    return nll, res


def _ctc_bwd(blank_id, interpret, res, g):
    (emit, can_skip, valid, ext_len, onehot_ext, logit_lengths, nll,
     alphas) = res
    demit = _run_backward(emit, can_skip, valid, logit_lengths, ext_len,
                          nll, alphas, interpret)
    # scatter extended positions back to vocab: one MXU matmul
    dlogprobs = jnp.einsum("bts,bsv->btv", demit, onehot_ext)
    dlogprobs = dlogprobs * g[:, None, None]
    return (dlogprobs, None, None, None)


_ctc_nll_from_logprobs.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_pallas(logits, logit_lengths, labels, label_lengths,
                    blank_id: int = -1,
                    ignore_longer_outputs_than_inputs: bool = True,
                    average_across_batch: bool = True,
                    interpret: bool = False):
    """Drop-in replacement for :func:`ops.ctc.ctc_loss` backed by the
    Pallas kernels. ``interpret=True`` runs the kernels in interpreter
    mode (for CPU tests)."""
    B, T, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = _ctc_nll_from_logprobs(logprobs, logit_lengths, labels,
                                 label_lengths, blank_id, interpret)
    if ignore_longer_outputs_than_inputs:
        L = labels.shape[1]
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
