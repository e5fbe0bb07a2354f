"""Transformer building blocks (reference `open_seq2seq/parts/
transformer/{common.py,embedding_layer.py,utils.py}`), flax-style.

  * :class:`SharedEmbedding` — one (V, d) table used for input embedding
    (scaled by sqrt(d)) and for the output softmax projection (its
    transpose), the reference's ``EmbeddingSharedWeights``
    (`embedding_layer.py:26`). The table is returned to callers so the
    decoder can share the *same parameter* through the encoder-output
    dict (the reference passes the layer object the same way).
  * sinusoidal position encoding (`utils.py:28-64`).
  * attention-bias helpers: padding bias and causal (lower-triangular)
    bias, both additive large-negative fp32 (`utils.py:89-129`).
  * :class:`PreNormResidual` — the reference's PrePostProcessingWrapper
    (layer-norm on input, dropout + residual on output, `common.py:77-106`).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..dropout import Dropout
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def get_position_encoding(length: int, hidden_size: int,
                          min_timescale: float = 1.0,
                          max_timescale: float = 1.0e4) -> np.ndarray:
    """Sinusoidal position signal, shape (length, hidden_size), fp32."""
    position = np.arange(length, dtype=np.float32)
    num_timescales = hidden_size // 2
    log_increment = (np.log(max_timescale / min_timescale) /
                     max(num_timescales - 1, 1))
    inv_timescales = min_timescale * np.exp(
        np.arange(num_timescales, dtype=np.float32) * -log_increment)
    scaled = position[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


def get_padding_bias(ids: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    """(B, 1, 1, T) additive bias: NEG_INF at padding positions."""
    pad = (ids == pad_id).astype(jnp.float32)
    return (pad * NEG_INF)[:, None, None, :]


def length_padding_bias(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B, 1, 1, T) bias from explicit lengths."""
    pad = (jnp.arange(max_len)[None, :] >= lengths[:, None])
    return pad.astype(jnp.float32)[:, None, None, :] * NEG_INF


def get_decoder_self_attention_bias(length: int) -> jnp.ndarray:
    """(1, 1, T, T) causal bias."""
    mask = np.triu(np.ones((length, length), np.float32), k=1)
    return (mask * NEG_INF)[None, None, :, :]


class SharedEmbedding(nn.Module):
    """Tied input-embedding / output-projection table."""
    vocab_size: int
    hidden_size: int
    pad_vocab_to_eight: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        v = self.vocab_size
        if self.pad_vocab_to_eight:
            v = (v + 7) // 8 * 8
        self.padded_vocab_size = v
        self.embedding = self.param(
            "embedding",
            nn.initializers.normal(self.hidden_size ** -0.5),
            (v, self.hidden_size), jnp.float32)

    def __call__(self, ids):
        """ids (B, T) -> embeddings (B, T, d), scaled, pad-id zeroed."""
        table = self.embedding.astype(self.dtype)
        emb = jnp.take(table, ids, axis=0)
        emb = emb * (self.hidden_size ** 0.5)
        # zero out embeddings of PAD (id 0), reference embedding_layer.py
        emb = emb * (ids != 0).astype(self.dtype)[..., None]
        return emb

    def linear(self, x):
        """Output projection with the transposed table -> fp32 (..., V).
        Inputs stay in the compute dtype (bf16 under "mixed" — the MXU
        runs bf16 x bf16 -> fp32-accumulate at ~4x its fp32 rate); only
        the accumulator/output is fp32 for softmax stability."""
        table = self.embedding.astype(self.dtype)
        logits = jnp.einsum("...d,vd->...v", x.astype(self.dtype), table,
                            preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def table(self):
        return self.embedding


def embed_ids(table, ids, hidden_size, dtype):
    """Functional embedding lookup with the shared table (used by the
    decoder which receives the table through the encoder output)."""
    emb = jnp.take(table.astype(dtype), ids, axis=0)
    emb = emb * (hidden_size ** 0.5)
    return emb * (ids != 0).astype(dtype)[..., None]


def project_logits(table, x, vocab_size):
    """x (..., d) @ table.T -> fp32 logits (..., V). The matmul runs in
    x's compute dtype (bf16 under "mixed": ~4x the fp32 MXU rate) with
    an fp32 accumulator — only the output is fp32, for the softmax."""
    logits = jnp.einsum("...d,vd->...v", x, table.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return logits[..., :vocab_size]


class PreNormResidual(nn.Module):
    """y = x + dropout(layer(layernorm(x), ...))."""
    layer: nn.Module
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *args, train: bool = False, **kwargs):
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="pre_norm")(x)
        y = self.layer(y, *args, train=train, **kwargs)
        extra = None
        if isinstance(y, tuple):
            y, extra = y
        from ...ops import dropout_pallas as dp
        from ..dropout import get_fused_dropout
        if (train and self.dropout_rate > 0.0 and get_fused_dropout()
                and x.shape == y.shape
                and dp.supported(y.shape, interpret=dp.FORCE_INTERPRET)):
            # mask generated in VMEM, dropout+residual in one kernel
            out = dp.fused_dropout_add(
                self.make_rng("dropout"), x, y, self.dropout_rate,
                interpret=dp.FORCE_INTERPRET)
        else:
            y = Dropout(rate=self.dropout_rate,
                        deterministic=not train)(y)
            out = x + y
        if extra is not None:
            return out, extra
        return out


class TransformerNorm(nn.Module):
    """Pre/post-process normalization selected by the config's
    ``norm_params`` (reference `parts/transformer/common.py:11-106`):
    the default layer norm, or the Transformer_BatchNorm variant
    (channel batch norm with running stats, optional center/scale)."""
    kind: str = "layernorm_L2"
    momentum: float = 0.95
    epsilon: float = 1e-4
    center_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch_norm":
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.momentum,
                                epsilon=self.epsilon,
                                use_bias=self.center_scale,
                                use_scale=self.center_scale,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(x)
        return nn.LayerNorm(dtype=self.dtype,
                            param_dtype=jnp.float32,
                            epsilon=1e-6)(x)


def make_norm(norm_params, dtype):
    p = norm_params or {}
    return TransformerNorm(kind=p.get("type", "layernorm_L2"),
                           momentum=p.get("momentum", 0.95),
                           epsilon=p.get("epsilon", 1e-4),
                           center_scale=p.get("center_scale", True),
                           dtype=dtype)
