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


class SelfAttention(nn.Module):
    """Fused-QKV self-attention; optional incremental decode cache."""
    hidden_size: int
    num_heads: int
    attention_dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, train: bool = False,
                 cache: Optional[Dict[str, jnp.ndarray]] = None,
                 decode_pos: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
        qkv = nn.DenseGeneral(3 * self.hidden_size, dtype=self.dtype,
                              param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
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

        drop = nn.Dropout(rate=self.attention_dropout,
                          deterministic=not train)
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

    def setup(self):
        mk = lambda name: nn.DenseGeneral(  # noqa: E731
            self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        self.q_proj = mk("q")
        self.k_proj = mk("k")
        self.v_proj = mk("v")
        self.out_proj = mk("out")
        self.drop = nn.Dropout(rate=self.attention_dropout)

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
        out = _attend(q, k, v, bias, self.attention_dropout, train,
                      self.dtype, drop)
        return self.out_proj(_merge_heads(out))


# Backwards-friendly alias used by encoder code
MultiHeadAttention = SelfAttention
