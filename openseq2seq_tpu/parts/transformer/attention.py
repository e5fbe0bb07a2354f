"""Multi-head attention with an explicit (pytree) KV cache.

The reference's split-heads MHA with incremental-decode cache
(`open_seq2seq/parts/transformer/attention_layer.py:24-227`), designed
TPU-first:

  * one fused QKV projection for self-attention (one big MXU matmul
    instead of three);
  * the decode cache is an explicit ``{"k": (B, T_max, h, d), "v": ...}``
    pytree updated with ``lax.dynamic_update_slice`` — it threads through
    ``lax.while_loop`` beam-search state cleanly (no flax mutable
    collections) and keeps the whole decode loop inside one jit;
  * cross-attention K/V are projected once per sequence
    (:meth:`CrossAttention.precompute_kv`) and reused every decode step;
  * attention logits/softmax in fp32 (bf16-safe), inputs/outputs in the
    compute dtype.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from ..dropout import Dropout
import jax
import jax.numpy as jnp


def _split_heads(x, num_heads):
    B, T, H = x.shape
    return x.reshape(B, T, num_heads, H // num_heads)


def _merge_heads(x):
    B, T, h, d = x.shape
    return x.reshape(B, T, h * d)


def _attend(q, k, v, bias, dropout_rate, train, dtype, dropout_mod):
    depth = q.shape[-1]
    q = q * (depth ** -0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    weights = dropout_mod(weights)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(dtype), v)


def _attend_lazy_beam(q, k_buf, v_buf, bias, ancestry, beam_size,
                      num_heads, dtype):
    """Incremental-decode attention over a beam-search cache whose rows
    were never physically reordered (``ops/beam_search.py``
    ``lazy_cache=True``).

    ``ancestry[(b*K+k), t]`` names the beam slot whose cache row holds
    beam k's KV for position t. Rather than gathering (K, T, h, d)
    keys/values per beam (a materialized copy the size of the cache),
    scores are computed against ALL K slots' keys and selected by
    ancestry afterwards; the value contraction folds the ancestry
    one-hot into the attention weights. K x the MXU FLOPs of gathered
    attention — decode is HBM-bound, so trading matmul work for
    cache-sized gather traffic wins.

    Layout is the whole trick. The cache stays HEAD-MERGED,
    (B*K, T, D=h*d): lane-full rows (no dh=64 half-lane padding), and
    both dots read it EXACTLY as stored — no transposes. Per-head
    scores come from a block-diagonal query: q expanded to
    (B, K*h, D) with head h's values in the head-h slice and zeros
    elsewhere, so q_bd . k_row contracts over D yet yields exact
    per-head logits (cross-head terms hit zeros). The value dot runs
    the same way and the per-head output is the diagonal block of the
    (B, K*h, D) result. A naive per-head einsum ("bkhd,bjthd->bkhjt")
    needs (b, h) as dot batch dims, which forces XLA to physically
    transpose the entire cache every step/layer — measured 9.3 vs
    22.2 sent/s/chip, i.e. worse than the gathers it replaced.

    Shapes: q (B*K, 1, D); k_buf/v_buf (B*K, T, D); bias broadcastable
    to (B, K, h, T) fp32; ancestry (B*K, T) int32.
    """
    BK, T, D = k_buf.shape
    K, h = beam_size, num_heads
    d = D // h
    B = BK // K
    q4 = (q.reshape(B, K, h, d) * (d ** -0.5)).astype(dtype)
    eye = jnp.eye(h, dtype=dtype)
    q_bd = (q4[:, :, :, None, :] *
            eye[None, None, :, :, None]).reshape(B, K * h, D)
    kb = k_buf.reshape(B, K * T, D)
    s_all = jax.lax.dot_general(
        q_bd, kb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (B,K*h,K*T)
    anc = ancestry.reshape(B, K, T)
    s5 = s_all.reshape(B, K, h, K, T)
    idx = jnp.broadcast_to(anc[:, :, None, None, :], (B, K, h, 1, T))
    logits = jnp.take_along_axis(s5, idx, axis=3)[:, :, :, 0, :]
    if bias is not None:
        logits = logits + bias.astype(jnp.float32).reshape(
            bias.shape[0], 1, 1, -1)                     # (B?|1,1,1,T)
    weights = jax.nn.softmax(logits, axis=-1)            # (B,K,h,T)
    onehot = (anc[:, :, None, :] ==
              jnp.arange(K, dtype=anc.dtype)[None, None, :, None])
    wfull = (weights[:, :, :, None, :] *
             onehot[:, :, None, :, :].astype(weights.dtype))
    wf = wfull.astype(dtype).reshape(B, K * h, K * T)
    vb = v_buf.reshape(B, K * T, D)
    o = jax.lax.dot_general(
        wf, vb, (((2,), (1,)), ((0,), (0,))))            # (B,K*h,D)
    out = jnp.einsum("bkhhd->bkhd", o.reshape(B, K, h, h, d))
    return out.reshape(BK, 1, h, d)


def _flash_ok(q, k):
    """Whether the fused TPU kernel applies to these shapes/backend."""
    return jax.default_backend() == "tpu" and \
        q.shape[-1] in (64, 128, 256) and min(q.shape[1], k.shape[1]) > 1


def _attend_flash(q, k, v, bias, causal, dtype):
    """Fused (flash) attention on TPU via the Pallas kernel shipped with
    JAX — O(T) memory: no (B, H, Tq, Tk) fp32 score tensor in HBM.

    This is an OPT-IN memory lever, not a default speed win: measured on
    v5e at B=64/H=16/D=64/T in {64..512} (bf16, fwd+bwd) the kernel is
    ~2x slower than XLA's fused plain attention, whose score tensors
    still fit in VMEM-friendly fusions at those sizes. It pays off when
    (B, H, T, T) scores dominate HBM (long sequences / big batches).

    Sequences pad to tile multiples internally; key padding is passed as
    segment ids; ``causal`` replaces the triangular bias (tail pad keys
    sit after every real query, so the causal mask already excludes
    them). Attention-weight dropout is NOT applied inside the kernel —
    callers substitute output dropout.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    # kernel constraint: kv blocks must be multiples of 128; q tiles
    # of 64 suffice (VPU sublane granularity)
    Tqp, Tkp = Tq + (-Tq % 64), Tk + (-Tk % 128)
    # valid-key mask from the additive padding bias (B, 1, 1, Tk):
    # 0 at valid keys, ~-1e9 at pads. Under causal the bias is the
    # (1, 1, T, T) triangle — the kernel's own mask replaces it.
    if not (bias is None or causal):
        # the flash path reinterprets the additive bias as a pure
        # key-padding row mask; anything else (e.g. a relative-position
        # bias) would be silently dropped — fail loudly instead
        if bias.shape not in ((B, 1, 1, Tk), (1, 1, 1, Tk)):
            raise ValueError(
                "use_flash supports only (B,1,1,Tk) key-padding biases; "
                "got bias shape {}".format(bias.shape))
    kv_valid = (jnp.ones((B, Tk), bool) if bias is None or causal
                else jnp.broadcast_to(bias.reshape(-1, Tk) > -1.0,
                                      (B, Tk)))
    if Tqp != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tqp - Tq), (0, 0), (0, 0)))
    if Tkp != Tk:
        k = jnp.pad(k, ((0, 0), (0, Tkp - Tk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Tkp - Tk), (0, 0), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Tkp - Tk)))
    seg = None
    if not causal:
        seg = SegmentIds(q=jnp.ones((B, Tqp), jnp.int32),
                         kv=jnp.where(kv_valid, 1, 2).astype(jnp.int32))
    bq, bk = min(128 if Tqp % 128 == 0 else 64, Tqp), min(128, Tkp)
    block_sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
        block_q_dq=bq)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), segment_ids=seg, causal=causal,
        sm_scale=float(D) ** -0.5, block_sizes=block_sizes)
    return out.transpose(0, 2, 1, 3)[:, :Tq].astype(dtype)


class SelfAttention(nn.Module):
    """Fused-QKV self-attention; optional incremental decode cache.

    ``use_flash`` routes full-sequence (non-cached) attention through
    the fused Pallas TPU kernel; ``causal`` then replaces the
    triangular bias (pass both the bias and causal=True so the plain
    fallback stays correct). With flash, attention-weight dropout is
    applied to the attention OUTPUT instead (same expected scale)."""
    hidden_size: int
    num_heads: int
    attention_dropout: float
    dtype: Any = jnp.float32
    use_flash: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, bias=None, train: bool = False,
                 cache: Optional[Dict[str, jnp.ndarray]] = None,
                 decode_pos: Optional[jnp.ndarray] = None,
                 beam_ancestry: Optional[jnp.ndarray] = None,
                 beam_size: Optional[int] = None,
                 packed_cache: Optional[jnp.ndarray] = None,
                 layer_idx: int = 0,
                 ) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
        qkv = nn.DenseGeneral(3 * self.hidden_size, dtype=self.dtype,
                              param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if packed_cache is not None:
            # Packed lane-full decode cache: ALL layers' K and V live in
            # ONE (B, T, 2*L*D) buffer, head-MERGED so rows are full
            # 128-lane multiples instead of dh=64 half-lane tiles, and
            # deliberately THREE-dimensional: a 5-D (B,T,L,2,D) variant
            # was profiled 18.7 vs 22.2 sent/s — XLA's layout
            # assignment relayouted the whole 1.4 GB buffer twice per
    # step and serialized the beam gather into 256-iteration
            # while loops of row-sized dynamic-slices. With boring
            # (B, T, C) rows the gather moves contiguous 2L*D-byte
            # rows and layouts stay put. Layer l's K occupies columns
            # [2lD, (2l+1)D), its V [(2l+1)D, (2l+2)D).
            if decode_pos is None:
                raise ValueError("decode cache requires decode_pos")
            D = self.hidden_size
            col = 2 * layer_idx * D
            upd = jnp.concatenate([k, v], axis=-1)        # (B,1,2D)
            buf = jax.lax.dynamic_update_slice(
                packed_cache, upd.astype(packed_cache.dtype),
                (0, decode_pos, col))
            # static column slices: views, not gathers
            k_full = _split_heads(buf[:, :, col:col + D],
                                  self.num_heads)
            v_full = _split_heads(buf[:, :, col + D:col + 2 * D],
                                  self.num_heads)
            q = _split_heads(q, self.num_heads)
            out = _attend(q, k_full, v_full, bias,
                          self.attention_dropout, train, self.dtype,
                          lambda w: w)
            out = nn.DenseGeneral(
                self.hidden_size, dtype=self.dtype,
                param_dtype=jnp.float32, name="out")(_merge_heads(out))
            return out, buf

        if cache is not None and beam_ancestry is not None:
            # lazy beam decode: the cache stays HEAD-MERGED (B*K, T, D)
            # — see _attend_lazy_beam for why layout is everything here
            if decode_pos is None:
                raise ValueError("decode cache requires decode_pos")
            k_buf = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype),
                (0, decode_pos, 0))
            v_buf = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype),
                (0, decode_pos, 0))
            out = _attend_lazy_beam(q, k_buf, v_buf, bias,
                                    beam_ancestry, beam_size,
                                    self.num_heads, self.dtype)
            out = nn.DenseGeneral(
                self.hidden_size, dtype=self.dtype,
                param_dtype=jnp.float32, name="out")(_merge_heads(out))
            return out, {"k": k_buf, "v": v_buf}

        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)

        new_cache = cache
        if cache is not None:
            if decode_pos is None:
                raise ValueError("decode cache requires decode_pos")
            k_buf = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, decode_pos, 0, 0))
            v_buf = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, decode_pos, 0, 0))
            new_cache = {"k": k_buf, "v": v_buf}
            k, v = k_buf, v_buf

        drop = Dropout(rate=self.attention_dropout,
                          deterministic=not train)
        if self.use_flash and cache is None and _flash_ok(q, k):
            out = _attend_flash(q, k, v, bias, self.causal, self.dtype)
            out = drop(out)   # weight dropout -> output dropout
        else:
            out = _attend(q, k, v, bias, self.attention_dropout, train,
                          self.dtype, drop)
        out = nn.DenseGeneral(self.hidden_size, dtype=self.dtype,
                              param_dtype=jnp.float32, name="out")(
            _merge_heads(out))
        return out, new_cache


class CrossAttention(nn.Module):
    """Encoder-decoder attention; K/V from memory or precomputed cache.

    setup-based (not compact) so ``precompute_kv`` can be called as a
    separate method during incremental decoding."""
    hidden_size: int
    num_heads: int
    attention_dropout: float
    dtype: Any = jnp.float32
    use_flash: bool = False

    def setup(self):
        mk = lambda name: nn.DenseGeneral(  # noqa: E731
            self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        self.q_proj = mk("q")
        self.k_proj = mk("k")
        self.v_proj = mk("v")
        self.out_proj = mk("out")
        self.drop = Dropout(rate=self.attention_dropout)

    def _kv(self, memory):
        return (_split_heads(self.k_proj(memory), self.num_heads),
                _split_heads(self.v_proj(memory), self.num_heads))

    def precompute_kv(self, memory) -> Dict[str, jnp.ndarray]:
        k, v = self._kv(memory)
        return {"k": k, "v": v}

    def __call__(self, x, memory=None, bias=None, train: bool = False,
                 kv_cache: Optional[Dict[str, jnp.ndarray]] = None):
        q = _split_heads(self.q_proj(x), self.num_heads)
        if kv_cache is not None:
            k, v = kv_cache["k"], kv_cache["v"]
        else:
            k, v = self._kv(memory)
        drop = lambda w: self.drop(w, deterministic=not train)  # noqa: E731
        # flash only in full-sequence training/eval; incremental decode
        # queries (Tq=1) stay on the plain path
        if self.use_flash and kv_cache is None and \
                q.shape[1] > 1 and _flash_ok(q, k):
            out = _attend_flash(q, k, v, bias, False, self.dtype)
            out = drop(out)   # weight dropout -> output dropout
        else:
            out = _attend(q, k, v, bias, self.attention_dropout, train,
                          self.dtype, drop)
        return self.out_proj(_merge_heads(out))


# Backwards-friendly alias used by encoder code
MultiHeadAttention = SelfAttention
