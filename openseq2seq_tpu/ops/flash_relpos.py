"""Flash self-attention with decoupled q·k vs v head dims — the kernel
under the Conformer's relative-position attention.

Why a custom kernel: the stock Pallas flash kernel takes the position
term as a materialized additive ``ab`` bias of shape (B, H, T, T) — so
while the content/softmax tensors stay in VMEM, the bias still makes
full HBM round-trips (measured a net LOSS vs the XLA chain: PARITY.md
queue17, M-scale 524.6 vs 729.4 utt/s). The fix here removes the bias
tensor entirely:

**The Transformer-XL position term is exactly rank-D separable.** The
rel-pos table row used at (query i, key j) is the sinusoid of argument
a = i - j + (T-1) (conformer_encoder.RelPosSelfAttention: reversed
table + pad-reshape shift). With g_i = K_r(q_i + w) the projected
position query (K_r the (D, H, Dh) table projection used by the XLA
path), the angle-difference identities give, per frequency m:

    sin(w_m a) = sin(w_m (i+T-1)) cos(w_m j) - cos(w_m (i+T-1)) sin(w_m j)
    cos(w_m a) = cos(w_m (i+T-1)) cos(w_m j) + sin(w_m (i+T-1)) sin(w_m j)

so the whole position score folds into an ordinary inner product

    bd[i, j] = A_i · cos_j + B_i · sin_j
    A_i[m] =  gs_m sin(w_m(i+T-1)) + gc_m cos(w_m(i+T-1))
    B_i[m] = -gs_m cos(w_m(i+T-1)) + gc_m sin(w_m(i+T-1))

with gs/gc the sin/cos halves of g_i (`rel_pos_embedding` lays the
table out [sin | cos], transformer_xl_encoder.py:53-60). Augmenting
q~ = [q+u ; A ; B] and k~ = [k ; cos_j ; sin_j] makes the attention
scores IDENTICAL to the XLA path's (ac + bd) while the kernel sees a
plain q~·k~ product: no (B,H,T,2T-1) table score, no (B,H,T,T) bias,
no shift — nothing but the O(T·(Dh+D)) augmented projections ever
touches HBM. ``fold_relpos`` builds the augmentation; this kernel just
needs q/k head dim (Dh + D) to differ from v's (Dh), which the stock
kernel cannot express — hence the custom fwd/bwd below (standard
online-softmax flash forward; two-kernel recompute backward, one
accumulating dk/dv per key block, one dq per query block).

Reference contract: none (the reference has no flash attention or
conformer; `open_seq2seq/parts/transformer/attention_layer.py` scores
materialize (B,H,T,T) in HBM by construction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LSE_LANES = 1       # lane width of the stored logsumexp/delta tensors
# (1 column: a block last-dim equal to the array dim is always legal,
# and at Conformer-L bs128 the 8-lane layout alone was ~125 MB of the
# 76 MB-over-budget OOM margin)

# tests flip this to run the kernels in interpreter mode on CPU
FORCE_INTERPRET = False


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc, m_i, l_i, *, scale, block_k, n_k):
    b = pl.program_id(0)
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        m_i[...] = jnp.full_like(m_i, NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0, 0]                                    # (bq, dqk)
    k = k_ref[0, 0]                                    # (bk, dqk)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (bq, bk)

    length = lens_ref[b, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block_k
    s = jnp.where(col < length, s, NEG_INF)

    m_prev = m_i[...]                                  # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                             # (bq, bk) f32
    l_i[...] = alpha * l_i[...] + jnp.sum(p, axis=1, keepdims=True)
    m_i[...] = m_new
    v = v_ref[0, 0]                                    # (bk, dv)
    acc[...] = acc[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jk == n_k - 1)
    def _emit():
        l = l_i[...]
        # lengths are clamped >= 1 outside, so every row saw >= 1 valid
        # key; l > 0 always. Guard anyway for the padded-T tail.
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = (acc[...] / l_safe).astype(o_ref.dtype)
        # lse stored (bq, LSE_LANES): last block dim must equal the
        # array dim or be 128-divisible on TPU; 8 lanes keeps it tiny
        lse_ref[0, 0] = jnp.broadcast_to(
            m_i[...] + jnp.log(l_safe), (l.shape[0], LSE_LANES))


def _fwd(q, k, v, lens, scale, block_q, block_k, interpret):
    B, H, T, dqk = q.shape
    dv = v.shape[-1]
    n_q, n_k = _cdiv(T, block_q), _cdiv(T, block_k)
    grid = (B, H, n_q, n_k)
    kern = functools.partial(_fwd_kernel, scale=scale,
                             block_k=block_k, n_k=n_k)
    o, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, dqk),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dqk),
                         lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dv),
                         lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, dv),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, LSE_LANES),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, dv), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, LSE_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dv), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# backward: dk/dv kernel (grid over key blocks, inner loop over query
# blocks) and dq kernel (grid over query blocks, inner over key blocks)
# ---------------------------------------------------------------------------
def _dkv_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale, block_k, n_q, dk_width):
    b = pl.program_id(0)
    jq = pl.program_id(3)
    jk = pl.program_id(2)

    @pl.when(jq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]                                    # (bq, dqk)
    k = k_ref[0, 0]                                    # (bk, dqk)
    v = v_ref[0, 0]                                    # (bk, dv)
    do = do_ref[0, 0]                                  # (bq, dv)
    lse = lse_ref[0, 0][:, :1]                         # (bq, 1)
    delta = d_ref[0, 0][:, :1]                         # (bq, 1)

    # q-major orientation throughout: transposed products are taken by
    # contracting dim 0 in dot_general, never by materializing k-major
    # tiles, and lse/delta broadcast as (bq, 1) columns
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (bq, bk)
    length = lens_ref[b, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block_k
    p = jnp.where(col < length, jnp.exp(s - lse), 0.0)

    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bk, dv)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, bk)
    ds = p * (dp - delta) * scale                      # (bq, bk) f32
    # dk only over the first dk_width columns of q: the rel-pos
    # augmentation of k is CONSTANT (cos/sin tables), so its gradient
    # is discarded by the caller — skipping it cuts the widest matmul
    # of this kernel from dqk to Dh (~20% of total kernel FLOPs at
    # Conformer geometry)
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q[:, :dk_width], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bk, dk_width)

    @pl.when(jq == n_q - 1)
    def _emit():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
               dq_ref, dq_acc, *, scale, block_k, n_k):
    b = pl.program_id(0)
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]                         # (bq, 1)
    delta = d_ref[0, 0][:, :1]                         # (bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (bq, bk)
    length = lens_ref[b, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block_k
    p = jnp.where(col < length, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, bk)
    ds = p * (dp - delta) * scale
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, dqk)

    @pl.when(jk == n_k - 1)
    def _emit():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_pallas(q, k, v, lens, o, lse, do, scale, block_q, block_k,
                interpret, dk_width=None):
    B, H, T, dqk = q.shape
    dk_width = dqk if dk_width is None else dk_width
    dv = v.shape[-1]
    n_q, n_k = _cdiv(T, block_q), _cdiv(T, block_k)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)             # (B, H, T, 1)
    delta = jnp.broadcast_to(delta, delta.shape[:-1] + (LSE_LANES,))

    V = pltpu.VMEM
    common_in = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, block_q, dqk),
                     lambda b, h, i, j: (b, h, i, 0), memory_space=V),
        pl.BlockSpec((1, 1, block_k, dqk),
                     lambda b, h, i, j: (b, h, j, 0), memory_space=V),
        pl.BlockSpec((1, 1, block_k, dv),
                     lambda b, h, i, j: (b, h, j, 0), memory_space=V),
        pl.BlockSpec((1, 1, block_q, dv),
                     lambda b, h, i, j: (b, h, i, 0), memory_space=V),
        pl.BlockSpec((1, 1, block_q, LSE_LANES),
                     lambda b, h, i, j: (b, h, i, 0), memory_space=V),
        pl.BlockSpec((1, 1, block_q, LSE_LANES),
                     lambda b, h, i, j: (b, h, i, 0), memory_space=V),
    ]

    # dk/dv: grid (B, H, n_k, n_q) — q blocks innermost; the q-side
    # specs above take (i=q block, j=k block), so swap the lambda args
    def swap(spec):
        if spec.block_shape is None:
            return spec
        im = spec.index_map
        return pl.BlockSpec(
            spec.block_shape,
            lambda b, h, jk, jq, _im=im: _im(b, h, jq, jk),
            memory_space=pltpu.VMEM)

    dk, dvv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_k=block_k,
                          n_q=n_q, dk_width=dk_width),
        grid=(B, H, n_k, n_q),
        in_specs=[swap(s) for s in common_in],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, dk_width),
                         lambda b, h, jk, jq: (b, h, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dv),
                         lambda b, h, jk, jq: (b, h, jk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape[:-1] + (dk_width,), k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dk_width), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v, do, lse, delta)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k,
                          n_k=n_k),
        grid=(B, H, n_q, n_k),
        in_specs=common_in,
        out_specs=pl.BlockSpec((1, 1, block_q, dqk),
                               lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dqk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lens, q, k, v, do, lse, delta)
    return dq, dk, dvv


# ---------------------------------------------------------------------------
# public entry: custom_vjp with padding handled here
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(q, k, v, lengths, sm_scale, block_q=128,
                    block_k=128, interpret=False):
    """Non-causal flash self-attention with a key-side padding mask.

    q, k: (B, H, T, dqk); v: (B, H, T, dv) — dqk and dv independent
    (the rel-pos fold widens q/k only). lengths: (B,) valid key counts.
    Returns (B, H, T, dv). Padded-T rows compute finite (later masked)
    outputs over the valid keys, matching the XLA path's semantics of
    masking only the key axis.
    """
    o, _ = _flash_fwd_res(q, k, v, lengths, sm_scale, block_q, block_k,
                          interpret)
    return o


def _pad_t(x, mult):
    T = x.shape[2]
    Tp = _cdiv(T, mult) * mult
    if Tp == T:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))


def _flash_fwd_res(q, k, v, lengths, sm_scale, block_q, block_k,
                   interpret):
    T = q.shape[2]
    mult = int(np.lcm(block_q, block_k))
    qp, kp, vp = (_pad_t(x, mult) for x in (q, k, v))
    lens = jnp.maximum(lengths.astype(jnp.int32), 1).reshape(-1, 1)
    o, lse = _fwd(qp, kp, vp, lens, float(sm_scale), block_q, block_k,
                  interpret)
    return o[:, :, :T], (qp, kp, vp, lens, o, lse)


def _flash_vjp_fwd(q, k, v, lengths, sm_scale, block_q, block_k,
                   interpret):
    o, res = _flash_fwd_res(q, k, v, lengths, sm_scale, block_q,
                            block_k, interpret)
    return o, (res, q.shape[2])


def _flash_vjp_bwd(sm_scale, block_q, block_k, interpret, res_t, g):
    (qp, kp, vp, lens, o, lse), T = res_t
    mult = int(np.lcm(block_q, block_k))
    gp = _pad_t(g, mult)
    dq, dk, dv = _bwd_pallas(qp, kp, vp, lens, o, lse, gp,
                             float(sm_scale), block_q, block_k,
                             interpret)
    return (dq[:, :, :T], dk[:, :, :T], dv[:, :, :T], None)


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# the rel-pos fold (builds the augmented q~/k~ for the kernel)
# ---------------------------------------------------------------------------
def fold_relpos(q_u, q_w, r_kernel, T: int, dim: int):
    """Fold the Transformer-XL position term into augmented q/k parts.

    q_u: (B, T, H, Dh) content queries (q + u bias) — passed through.
    q_w: (B, T, H, Dh) position queries (q + w bias).
    r_kernel: (D, H, Dh) the table projection ("r" DenseGeneral kernel).
    Returns (q_aug, k_aug_pos): q_aug (B, H, T, Dh + D) and the shared
    key augmentation (T, D) = [cos_j | sin_j] to concatenate onto k.

    Exactness: scores q_aug · [k | k_aug_pos] equal the XLA path's
    (q+u)·k + (q+w)·R_shift (see module docstring for the identity).
    """
    B, T_, H, Dh = q_w.shape
    m = dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))  # (m,)
    # per-query angles use argument (i + T - 1); per-key angles use j
    ang_i = (np.arange(T) + T - 1)[:, None] * inv_freq[None, :]
    ang_j = np.arange(T)[:, None] * inv_freq[None, :]
    si = jnp.asarray(np.sin(ang_i), jnp.float32)       # (T, m)
    ci = jnp.asarray(np.cos(ang_i), jnp.float32)
    k_aug = jnp.asarray(
        np.concatenate([np.cos(ang_j), np.sin(ang_j)], axis=1),
        q_w.dtype)                                     # (T, D)

    # g = K_r (q + w): (B, H, T, D) position queries in the table basis
    # (bf16 operands, f32 accumulation — same precision class as the
    # XLA path's pos_score einsum)
    g = jnp.einsum("bthd,phd->bhtp", q_w,
                   r_kernel.astype(q_w.dtype),
                   preferred_element_type=jnp.float32)
    gs, gc = g[..., :m], g[..., m:]
    A = gs * si[None, None] + gc * ci[None, None]      # (B, H, T, m)
    Bq = gc * si[None, None] - gs * ci[None, None]
    q_aug = jnp.concatenate(
        [q_u.transpose(0, 2, 1, 3).astype(q_w.dtype),
         A.astype(q_w.dtype), Bq.astype(q_w.dtype)], axis=-1)
    return q_aug, k_aug


# ---------------------------------------------------------------------------
# memory-lean rel-pos entry: the vjp boundary OUTSIDE the fold.
#
# flash_attention() saves its (padded) q/k operands as residuals; with
# the rel-pos augmentation those are (B, H, T, Dh + D) per layer —
# 0.67 GB/tensor at Conformer-L bs256, which is what re-OOMed the
# queue19 bs256 probe (48 GB requested). The augmentation itself is
# cheap (one BTD^2 einsum + elementwise trig), so this wrapper saves
# only the ORIGINAL (B, T, H, Dh) tensors and rebuilds q~/k~ inside
# the backward, then maps the kernel's augmented gradients back:
#
#   dq_u = dq~[..., :Dh]
#   dA, dB = dq~[..., Dh:Dh+m], dq~[..., Dh+m:Dh+D]
#   dgs = dA si - dB ci ;  dgc = dA ci + dB si      (A/B defs above)
#   dq_w = K_r^T dg ;  dK_r = sum_bt dg (x) q_w
#   dk  = dk~[..., :Dh]   (the cos/sin key augmentation is constant)
# ---------------------------------------------------------------------------
def _angles(T: int, dim: int):
    m = dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))
    ang_i = (np.arange(T) + T - 1)[:, None] * inv_freq[None, :]
    ang_j = np.arange(T)[:, None] * inv_freq[None, :]
    si = jnp.asarray(np.sin(ang_i), jnp.float32)        # (T, m)
    ci = jnp.asarray(np.cos(ang_i), jnp.float32)
    k_pos = jnp.asarray(
        np.concatenate([np.cos(ang_j), np.sin(ang_j)], axis=1),
        jnp.float32)                                    # (T, dim)
    return si, ci, k_pos


def _build_aug(q_u, q_w, k, r_kernel, si, ci, k_pos, lane_pad):
    """(B,T,H,Dh) inputs -> padded kernel-layout (B,H,T,dqk) q~/k~."""
    B, T, H, Dh = q_w.shape
    D = r_kernel.shape[0]
    m = D // 2
    # the whole chain stays in the compute dtype (bf16 under "mixed"):
    # a f32 g is a 1 GB-per-block transient at Conformer-L bs256
    # (queue19c OOM dump) and the XLA path's pos_score einsum is bf16
    # anyway — same precision class
    g = jnp.einsum("bthd,phd->bhtp", q_w,
                   r_kernel.astype(q_w.dtype))
    gs, gc = g[..., :m], g[..., m:]
    si_c = si[None, None].astype(g.dtype)
    ci_c = ci[None, None].astype(g.dtype)
    A = gs * si_c + gc * ci_c
    Bq = gc * si_c - gs * ci_c
    q_aug = jnp.concatenate(
        [q_u.transpose(0, 2, 1, 3).astype(q_w.dtype), A, Bq], axis=-1)
    k_aug = jnp.concatenate(
        [k.transpose(0, 2, 1, 3),
         jnp.broadcast_to(k_pos[None, None].astype(k.dtype),
                          (B, H, T, D))], axis=-1)
    if lane_pad:
        q_aug = jnp.pad(q_aug,
                        ((0, 0), (0, 0), (0, 0), (0, lane_pad)))
        k_aug = jnp.pad(k_aug,
                        ((0, 0), (0, 0), (0, 0), (0, lane_pad)))
    return q_aug, k_aug


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def rel_flash_attention(q_u, q_w, k, v, r_kernel, lengths, sm_scale,
                        block_q=128, block_k=128, interpret=False):
    """Rel-pos flash attention, module-facing layout (B, T, H, Dh) in
    and out. Scores equal the XLA path's (q+u)·k + (q+w)·R_shift
    exactly (module docstring); residual memory is O(B T D), not
    O(B T (D + H D))."""
    o, _ = _rel_fwd_res(q_u, q_w, k, v, r_kernel, lengths, sm_scale,
                        block_q, block_k, interpret)
    return o


def _rel_fwd_res(q_u, q_w, k, v, r_kernel, lengths, sm_scale,
                 block_q, block_k, interpret):
    B, T, H, Dh = q_w.shape
    D = r_kernel.shape[0]
    lane_pad = -(Dh + D) % 128
    si, ci, k_pos = _angles(T, D)
    q_aug, k_aug = _build_aug(q_u, q_w, k, r_kernel, si, ci, k_pos,
                              lane_pad)
    mult = int(np.lcm(block_q, block_k))
    qp = _pad_t(q_aug, mult)
    kp = _pad_t(k_aug, mult)
    vp = _pad_t(v.transpose(0, 2, 1, 3), mult)
    lens = jnp.maximum(lengths.astype(jnp.int32), 1).reshape(-1, 1)
    o, lse = _fwd(qp, kp, vp, lens, float(sm_scale), block_q, block_k,
                  interpret)
    ctx = o[:, :, :T].transpose(0, 2, 1, 3)
    return ctx, (o, lse, lens)


def _rel_vjp_fwd(q_u, q_w, k, v, r_kernel, lengths, sm_scale,
                 block_q, block_k, interpret):
    ctx, (o, lse, lens) = _rel_fwd_res(q_u, q_w, k, v, r_kernel,
                                       lengths, sm_scale, block_q,
                                       block_k, interpret)
    # residuals in COMPACT layouts: TPU HBM tiling pads the minor two
    # dims to (8, 128), so a (B,H,T,1) f32 lse physically occupies
    # 128x its logical bytes (134 MB/layer at Conformer-L bs128 — the
    # stubborn 76 MB OOM margin, queue21b) and (B,T,H,Dh) tensors pad
    # Dh 64->128. Reshape to lane-full shapes before saving; the bwd
    # re-expands transiently (one layer at a time).
    B, T, H, Dh = q_w.shape
    lse3 = lse[..., 0]                                  # (B,H,Tp)
    ctx2 = ctx.reshape(B, T, H * Dh)
    res = (q_u.reshape(B, T, H * Dh), q_w.reshape(B, T, H * Dh),
           k.reshape(B, T, H * Dh), v.reshape(B, T, H * Dh),
           r_kernel, lens, ctx2, lse3, o.shape[2])
    return ctx, res


def _rel_vjp_bwd(sm_scale, block_q, block_k, interpret, res, g):
    (q_u2, q_w2, k2, v2, r_kernel, lens, ctx2, lse3, Tp) = res
    B, T, D_model = q_w2.shape
    H = lse3.shape[1]
    Dh = D_model // H
    unflat = lambda a: a.reshape(B, T, H, Dh)           # noqa: E731
    q_u, q_w, k, v = (unflat(a) for a in (q_u2, q_w2, k2, v2))
    # re-expand the kernel-layout o/lse (transient, one layer's bwd)
    o = jnp.pad(
        ctx2.reshape(B, T, H, Dh).transpose(0, 2, 1, 3),
        ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    lse = lse3[..., None]
    # the whole point of rebuilding q~/k~ here is to let the forward's
    # padded augmented tensors DIE after the forward kernel — but
    # XLA's CSE recognizes the rebuild as the same value and reuses
    # the forward buffers, keeping every layer's (B,H,T,Dh+D) pads
    # alive across the step (queue19b: 17 x 2 x 640 MB = the 48 GB
    # Conformer-L bs256 OOM). The barrier makes the rebuilt values
    # distinct so the recompute actually happens.
    q_u, q_w, k, v, r_kernel = jax.lax.optimization_barrier(
        (q_u, q_w, k, v, r_kernel))
    B, T, H, Dh = q_w.shape
    D = r_kernel.shape[0]
    m = D // 2
    lane_pad = -(Dh + D) % 128
    si, ci, k_pos = _angles(T, D)
    q_aug, k_aug = _build_aug(q_u, q_w, k, r_kernel, si, ci, k_pos,
                              lane_pad)
    mult = int(np.lcm(block_q, block_k))
    qp = _pad_t(q_aug, mult)
    kp = _pad_t(k_aug, mult)
    vp = _pad_t(v.transpose(0, 2, 1, 3), mult)
    gp = _pad_t(g.transpose(0, 2, 1, 3), mult)
    dq_aug, dk_aug, dv = _bwd_pallas(qp, kp, vp, lens, o, lse, gp,
                                     float(sm_scale), block_q,
                                     block_k, interpret, dk_width=Dh)
    dq_aug = dq_aug[:, :, :T]
    dk_aug = dk_aug[:, :, :T]
    dv = dv[:, :, :T].transpose(0, 2, 1, 3).astype(v.dtype)

    dq_u = dq_aug[..., :Dh].transpose(0, 2, 1, 3).astype(q_u.dtype)
    dA = dq_aug[..., Dh:Dh + m]
    dB = dq_aug[..., Dh + m:Dh + D]
    si_c = si[None, None].astype(dA.dtype)
    ci_c = ci[None, None].astype(dA.dtype)
    dgs = dA * si_c - dB * ci_c
    dgc = dA * ci_c + dB * si_c
    dg = jnp.concatenate([dgs, dgc], axis=-1)           # (B,H,T,D)
    dq_w = jnp.einsum("bhtp,phd->bthd", dg,
                      r_kernel.astype(q_w.dtype),
                      preferred_element_type=jnp.float32
                      ).astype(q_w.dtype)
    dK_r = jnp.einsum("bhtp,bthd->phd", dg, q_w,
                      preferred_element_type=jnp.float32
                      ).astype(r_kernel.dtype)
    dk = dk_aug.transpose(0, 2, 1, 3).astype(k.dtype)
    return (dq_u, dq_w, dk, dv, dK_r, None)


rel_flash_attention.defvjp(_rel_vjp_fwd, _rel_vjp_bwd)
