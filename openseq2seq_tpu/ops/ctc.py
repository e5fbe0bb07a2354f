"""CTC loss and greedy decoding, pure JAX/XLA.

The reference relies on ``tf.nn.ctc_loss`` (CUDA) and
``tf.nn.ctc_greedy_decoder`` (`open_seq2seq/losses/ctc_loss.py:19-90`,
`decoders/fc_decoders.py:161-254`). Here both run on-device:

  * :func:`ctc_loss` — fp32 log-space alpha (forward) recursion as a
    `lax.scan` over time, vectorized over batch and label positions, so
    the whole loss is one fused XLA loop (differentiable through the
    scan; no custom VJP needed).
  * :func:`ctc_greedy_decode` — argmax, collapse repeats, drop blanks,
    compacted into a dense (B, T) id matrix + lengths via a cumsum
    scatter (static shapes — TPU friendly).

Semantics preserved from the reference:
  * ``ignore_longer_outputs_than_inputs`` — sequences whose labels cannot
    fit in the logit length get exactly 0 loss (and 0 gradient) instead
    of inf/NaN (`losses/ctc_loss.py:78-86`).
  * blank id is the last class (reference convention: vocab chars then
    blank, `decoders/fc_decoders.py` + `data/speech2text`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large-negative stand-in for -inf (avoids nan in grads)


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mx = jnp.maximum(mx, _NEG_INF)  # keep (-inf,-inf) stable
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


def ctc_loss(logits: jax.Array,
             logit_lengths: jax.Array,
             labels: jax.Array,
             label_lengths: jax.Array,
             blank_id: int = -1,
             ignore_longer_outputs_than_inputs: bool = True,
             average_across_batch: bool = True) -> jax.Array:
    """CTC negative log likelihood.

    Args:
      logits: (B, T, V) unnormalized scores (any float dtype; the
        recursion runs in fp32 as the reference forces —
        `losses/ctc_loss.py`'s dtype handling).
      logit_lengths: (B,) valid frames per example.
      labels: (B, L) int labels, padded arbitrarily past label_lengths.
      label_lengths: (B,) valid labels per example.
      blank_id: index of the CTC blank; -1 means V-1 (last class).
      ignore_longer_outputs_than_inputs: zero the loss of infeasible
        examples instead of returning inf.
      average_across_batch: return scalar mean over batch, else (B,).
    """
    B, T, V = logits.shape
    L = labels.shape[1]
    S = 2 * L + 1
    if blank_id < 0:
        blank_id = V + blank_id

    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # extended label sequence: blank, l1, blank, l2, ..., blank
    s_idx = jnp.arange(S)
    is_label_pos = (s_idx % 2) == 1
    label_idx = jnp.clip((s_idx - 1) // 2, 0, L - 1)
    ext = jnp.where(is_label_pos[None, :], labels[:, label_idx],
                    blank_id)                                    # (B, S)
    # transition "skip" allowed into position s when s is a label position
    # differing from the label two back
    ext_m2 = jnp.concatenate([jnp.full((B, 2), blank_id), ext[:, :-2]], axis=1)
    can_skip = is_label_pos[None, :] & (ext != ext_m2) & (s_idx >= 2)[None, :]
    # positions beyond the true extended length never participate
    ext_len = 2 * label_lengths + 1                              # (B,)
    valid_s = s_idx[None, :] < ext_len[:, None]                   # (B, S)

    # emission log-probs per (b, t, s): gather along vocab
    emit = jnp.take_along_axis(
        logprobs, ext[:, None, :].repeat(T, axis=1), axis=2)     # (B, T, S)

    alpha0 = jnp.full((B, S), _NEG_INF, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(has_label, emit[:, 0, 1], _NEG_INF))
    alpha0 = jnp.where(valid_s, alpha0, _NEG_INF)

    emit_t = jnp.moveaxis(emit, 1, 0)                            # (T, B, S)

    def step(alpha, inputs):
        emit_row, t = inputs
        stay = alpha
        shift1 = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF), alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate(
            [jnp.full((B, 2), _NEG_INF), alpha[:, :-2]], axis=1)
        cand = _logaddexp(stay, shift1)
        cand = jnp.where(can_skip, _logaddexp(cand, shift2), cand)
        new_alpha = cand + emit_row
        new_alpha = jnp.where(valid_s, new_alpha, _NEG_INF)
        # frozen past the example's logit length
        active = (t < logit_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    ts = jnp.arange(1, T)
    alpha_final, _ = jax.lax.scan(step, alpha0, (emit_t[1:], ts))

    end = jnp.clip(ext_len - 1, 0, S - 1)                         # last blank
    end_m1 = jnp.clip(ext_len - 2, 0, S - 1)                      # last label
    a_end = jnp.take_along_axis(alpha_final, end[:, None], axis=1)[:, 0]
    a_end_m1 = jnp.take_along_axis(alpha_final, end_m1[:, None], axis=1)[:, 0]
    a_end_m1 = jnp.where(has_label, a_end_m1, _NEG_INF)
    nll = -_logaddexp(a_end, a_end_m1)                            # (B,)

    if ignore_longer_outputs_than_inputs:
        # frames needed: one per label plus one per adjacent repeat
        lbl_prev = jnp.concatenate([jnp.full((B, 1), -1), labels[:, :-1]],
                                   axis=1)
        in_range = jnp.arange(L)[None, :] < label_lengths[:, None]
        repeats = jnp.sum((labels == lbl_prev) & in_range, axis=1)
        feasible = logit_lengths >= (label_lengths + repeats)
        nll = jnp.where(feasible, nll, 0.0)
        # stop any residual gradient through infeasible rows
        nll = jnp.where(feasible, nll, jax.lax.stop_gradient(nll))

    if average_across_batch:
        return jnp.mean(nll)
    return nll


@partial(jax.jit, static_argnames=("blank_id", "merge_repeated"))
def ctc_greedy_decode(logits: jax.Array,
                      logit_lengths: jax.Array,
                      blank_id: int = -1,
                      merge_repeated: bool = True):
    """Greedy (best-path) CTC decoding.

    Returns ``(ids, lengths)`` where ``ids`` is (B, T) left-compacted
    decoded label ids padded with -1, matching the sparse output of
    ``tf.nn.ctc_greedy_decoder`` once densified.
    """
    B, T, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    best = jnp.argmax(logits, axis=-1)                            # (B, T)
    t_idx = jnp.arange(T)[None, :]
    in_time = t_idx < logit_lengths[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, best.dtype), best[:, :-1]],
                           axis=1)
    keep = (best != blank_id) & in_time
    if merge_repeated:
        keep &= (best != prev)
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1          # target slot
    lengths = jnp.maximum(jnp.max(pos, axis=1) + 1, 0)
    # scatter kept ids into their compacted slot; dropped frames go to a
    # dummy slot T that is sliced away (avoids duplicate-index collisions)
    out = jnp.full((B, T + 1), -1, best.dtype)
    scatter_pos = jnp.where(keep, pos, T)
    out = jax.vmap(lambda o, p, v: o.at[p].set(v))(out, scatter_pos, best)
    out = out[:, :T]
    out = jnp.where(t_idx < lengths[:, None], out, -1)
    return out, lengths
