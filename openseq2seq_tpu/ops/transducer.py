"""RNN-Transducer (RNN-T) loss, pure JAX/XLA (Graves 2012).

Beyond-parity component: the reference stops at CTC + attention ASR
(`open_seq2seq/losses/ctc_loss.py`, `decoders/las_decoder.py`); the
transducer — the streaming-ASR architecture of record — has no
counterpart there. Conventions follow the rest of this framework:
blank is the LAST class (`ops/ctc.py`), lengths are per-example, and
the recursion runs in fp32 regardless of the model compute dtype.

TPU-first design:

  * The (t, u) lattice recursion is sequential along anti-diagonals
    d = t + u, and every cell on a diagonal depends only on the
    previous diagonal. We therefore run ONE ``lax.scan`` of T+U steps
    carrying a (B, U+1) diagonal vector — all batch and label-position
    parallelism stays inside the step (VPU-wide), and there is no
    data-dependent control flow.
  * The two per-step gathers (blank/label log-probs along a diagonal)
    are hoisted OUT of the scan: the (B, T, U+1) tensors are re-indexed
    into diagonal coordinates once with a single static
    ``take_along_axis`` each, so the scan body is pure arithmetic
    (add, shift, logaddexp) — XLA fuses it into one tight loop.
  * The backward pass is plain autodiff through the scan: residuals are
    one (B, U+1) row per diagonal — the same order of memory as the
    already-materialized joint logits, so no custom VJP is needed.

Unlike CTC there is no infeasible-length case: any (T >= 1, U >= 0)
pair has non-zero probability because a frame may emit several labels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ctc import _logaddexp

_NEG_INF = -1e30


def _fastemit_scale(label_lp: jax.Array, lam: float) -> jax.Array:
    """FastEmit emission-gradient scaling (Yu et al. 2021,
    arXiv:2010.11148): identity on the forward value, but the cotangent
    flowing back into the label (emit) log-probs is scaled by (1 + lam).
    Blank-transition gradients are untouched, so training is pushed
    toward emitting labels earlier — the sequence-level latency
    regularizer for streaming transducers. lam == 0 is a no-op."""
    if lam == 0.0:
        return label_lp

    @jax.custom_vjp
    def scale(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        return (g * (1.0 + lam),)

    scale.defvjp(fwd, bwd)
    return scale(label_lp)


def transducer_loss(logits: jax.Array,
                    logit_lengths: jax.Array,
                    labels: jax.Array,
                    label_lengths: jax.Array,
                    blank_id: int = -1,
                    average_across_batch: bool = True,
                    fastemit_lambda: float = 0.0) -> jax.Array:
    """Transducer negative log likelihood.

    Args:
      logits: (B, T, U+1, V) joint-network outputs. Position u of the
        third axis conditions on the first u reference labels.
      logit_lengths: (B,) valid encoder frames per example.
      labels: (B, U) int reference labels (padded arbitrarily).
      label_lengths: (B,) valid labels per example.
      blank_id: blank index; -1 means V-1 (framework convention).
      average_across_batch: mean over batch if True, else (B,).

    Returns the scalar (or per-example) negative log likelihood.
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    if blank_id < 0:
        blank_id = V + blank_id

    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp = lp[..., blank_id]                                # (B,T,U1)
    # label_lp[b,t,u] = lp[b,t,u,labels[b,u]] for u < U; emitting from
    # u = U (all labels consumed) or u >= label_len is impossible
    if U > 0:
        lab = jnp.clip(labels, 0, V - 1).astype(jnp.int32)
        label_lp = jnp.take_along_axis(
            lp[:, :, :U, :], lab[:, None, :, None], axis=3)[..., 0]
        label_lp = jnp.concatenate(
            [label_lp, jnp.full((B, T, 1), _NEG_INF)], axis=2)  # (B,T,U1)
    else:
        label_lp = jnp.full((B, T, U1), _NEG_INF)
    u_idx = jnp.arange(U1)
    label_lp = jnp.where(
        u_idx[None, None, :] < label_lengths[:, None, None],
        label_lp, _NEG_INF)
    label_lp = _fastemit_scale(label_lp, fastemit_lambda)

    # --- re-index into diagonal coordinates: diag[d, u] = M[d - u, u] ---
    D = T + U                                    # diagonals 0 .. T-1+U
    d_idx = jnp.arange(D)
    t_of = d_idx[:, None] - u_idx[None, :]                       # (D, U1)
    on_lattice = (t_of >= 0) & (t_of <= T - 1)
    gather_t = jnp.clip(t_of, 0, T - 1)[None]                    # (1,D,U1)
    gather_t = jnp.broadcast_to(gather_t, (B, D, U1))

    def to_diag(m):
        diag = jnp.take_along_axis(m, gather_t, axis=1)          # (B,D,U1)
        return jnp.where(on_lattice[None], diag, _NEG_INF)

    blank_diag = to_diag(blank_lp)
    label_diag = to_diag(label_lp)

    # --- wavefront: alpha[t,u] = logaddexp(alpha[t-1,u] + blank[t-1,u],
    #                                       alpha[t,u-1] + label[t,u-1])
    # with a_d[u] = alpha[d-u, u]; both source terms live on diag d-1.
    a0 = jnp.full((B, U1), _NEG_INF).at[:, 0].set(0.0)

    def step(a, diag):
        bd, ld = diag                                            # (B,U1)
        blank_term = a + bd
        label_term = a + ld
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF), label_term[:, :-1]], axis=1)
        new = _logaddexp(blank_term, shifted)
        return new, new

    # diagonals 1..D-1 consume source diagonals 0..D-2
    xs = (jnp.moveaxis(blank_diag[:, :D - 1], 1, 0),
          jnp.moveaxis(label_diag[:, :D - 1], 1, 0))             # (D-1,B,U1)
    _, hist = jax.lax.scan(step, a0, xs)
    alpha = jnp.concatenate([a0[None], hist], axis=0)            # (D,B,U1)

    # log P(y|x) = alpha[T_b - 1, U_b] + blank_lp[T_b - 1, U_b]
    b_idx = jnp.arange(B)
    t_last = jnp.clip(logit_lengths - 1, 0, T - 1).astype(jnp.int32)
    u_last = jnp.clip(label_lengths, 0, U).astype(jnp.int32)
    d_last = t_last + u_last
    ll = alpha[d_last, b_idx, u_last] + blank_lp[b_idx, t_last, u_last]
    loss = -jnp.where(logit_lengths > 0, ll, 0.0)
    if average_across_batch:
        return jnp.mean(loss)
    return loss


def transducer_loss_fused(enc_j: jax.Array,
                          pred_j: jax.Array,
                          joint_b: jax.Array,
                          out_w: jax.Array,
                          out_b: jax.Array,
                          logit_lengths: jax.Array,
                          labels: jax.Array,
                          label_lengths: jax.Array,
                          blank_id: int = -1,
                          average_across_batch: bool = True,
                          block_size: int = 8,
                          fastemit_lambda: float = 0.0) -> jax.Array:
    """Memory-efficient transducer loss: the joint network is evaluated
    INSIDE the wavefront scan, so the (B, T, U+1, V) logit lattice —
    the memory wall of RNN-T training — is never materialized. The scan
    is BLOCKED: each step evaluates the joint for ``block_size``
    consecutive anti-diagonals in one batched matmul + log-softmax
    (MXU-sized: (B·W·(U+1), J) @ (J, V) rows instead of W skinny
    calls), then folds them into the alpha recursion with ``block_size``
    unrolled (cheap, VPU-wide) logaddexp updates. ``jax.checkpoint`` on
    the block step makes the backward pass recompute the block's joint
    instead of storing it: residual memory is O(B·(T+U)·(U+1)) scalars
    — no V or J factor.

    Compute overhead vs the materialized lattice is (T+U)/T forward
    (clipped diagonals are rectangular) plus one recompute in backward;
    on TPU this trades cheap MXU FLOPs for the HBM capacity that
    otherwise caps batch size (and with it MXU utilization).

    Args:
      enc_j: (B, T, J) encoder activations AFTER the joint encoder
        projection (compute dtype; the lattice math casts to fp32 only
        at the log-softmax, matching the unfused path).
      pred_j: (B, U+1, J) prediction-net activations after the joint
        prediction projection (position u conditions on u labels).
      joint_b: (J,) joint bias. out_w/out_b: (J, V)/(V,) output proj.
      logit_lengths, labels, label_lengths, blank_id,
        average_across_batch: as in :func:`transducer_loss`.
      block_size: anti-diagonals per scan step (static; trailing
        partial blocks compute garbage alphas that are sliced off
        before use).
    """
    B, T, J = enc_j.shape
    U1 = pred_j.shape[1]
    U = U1 - 1
    V = out_w.shape[1]
    if blank_id < 0:
        blank_id = V + blank_id

    dt = enc_j.dtype
    pred_j = pred_j.astype(dt)
    joint_b = joint_b.astype(dt)
    out_w = out_w.astype(dt)
    out_b = out_b.astype(dt)

    u_idx = jnp.arange(U1)
    lab_u1 = jnp.concatenate(
        [jnp.clip(labels, 0, V - 1).astype(jnp.int32),
         jnp.zeros((B, 1), jnp.int32)], axis=1)                  # (B,U1)
    # emitting a label from position u requires u < label_len (and u < U)
    label_ok = u_idx[None, :] < jnp.minimum(label_lengths, U)[:, None]

    W = max(1, int(block_size))

    def block_logprobs(d0):
        """Blank/label log-probs for every lattice cell on the W source
        diagonals d0 .. d0+W-1 (cells (t=d-u, u)); off-lattice cells
        (incl. whole padded diagonals past D-1) → -inf."""
        t_of = (d0 + jnp.arange(W))[:, None] - u_idx[None, :]    # (W,U1)
        on_lat = (t_of >= 0) & (t_of <= T - 1)
        enc_d = enc_j[:, jnp.clip(t_of, 0, T - 1), :]          # (B,W,U1,J)
        h = jnp.tanh(enc_d + pred_j[:, None] + joint_b)
        logits = (h @ out_w + out_b).astype(jnp.float32)       # (B,W,U1,V)
        lp = jax.nn.log_softmax(logits, axis=-1)
        blank_d = lp[..., blank_id]
        label_d = jnp.take_along_axis(
            lp, jnp.broadcast_to(lab_u1[:, None, :, None],
                                 (B, W, U1, 1)), axis=3)[..., 0]
        blank_d = jnp.where(on_lat[None], blank_d, _NEG_INF)
        label_d = jnp.where(on_lat[None] & label_ok[:, None],
                            label_d, _NEG_INF)
        label_d = _fastemit_scale(label_d, fastemit_lambda)
        return blank_d, label_d                                # (B,W,U1)

    a0 = jnp.full((B, U1), _NEG_INF).at[:, 0].set(0.0)

    @jax.checkpoint
    def block_step(a, d_first):
        bd, ld = block_logprobs(d_first - 1)     # diags d_first-1 + [0,W)
        outs = []
        for w in range(W):
            blank_term = a + bd[:, w]
            label_term = a + ld[:, w]
            shifted = jnp.concatenate(
                [jnp.full((B, 1), _NEG_INF), label_term[:, :-1]], axis=1)
            a = _logaddexp(blank_term, shifted)
            outs.append(a)
        return a, jnp.stack(outs, 0)                           # (W,B,U1)

    D = T + U
    nsteps = -(-(D - 1) // W)                                  # ceil
    xs = 1 + W * jnp.arange(nsteps)
    _, hist = jax.lax.scan(block_step, a0, xs)                 # (n,W,B,U1)
    # trailing padded diagonals (>= D) produced -inf garbage: slice off
    hist = hist.reshape(nsteps * W, B, U1)[:D - 1]
    alpha = jnp.concatenate([a0[None], hist], axis=0)            # (D,B,U1)

    b_idx = jnp.arange(B)
    t_last = jnp.clip(logit_lengths - 1, 0, T - 1).astype(jnp.int32)
    u_last = jnp.clip(label_lengths, 0, U).astype(jnp.int32)
    d_last = t_last + u_last
    # final blank emission log-prob at (T_b-1, U_b), computed pointwise
    h_fin = jnp.tanh(enc_j[b_idx, t_last] + pred_j[b_idx, u_last] +
                     joint_b)                                    # (B,J)
    lp_fin = jax.nn.log_softmax(
        (h_fin @ out_w + out_b).astype(jnp.float32), axis=-1)
    ll = alpha[d_last, b_idx, u_last] + lp_fin[:, blank_id]
    loss = -jnp.where(logit_lengths > 0, ll, 0.0)
    if average_across_batch:
        return jnp.mean(loss)
    return loss
