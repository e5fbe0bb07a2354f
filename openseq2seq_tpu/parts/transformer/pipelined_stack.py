"""Pipeline-parallel transformer layer stack.

Beyond reference parity (OpenSeq2Seq has data parallelism only, SURVEY
§2.2): the N homogeneous pre-norm [self-attention, FFN] encoder layers
with all parameters STACKED on a leading layer axis — the idiomatic
TPU/JAX layout for a deep homogeneous stack:

  * the leading axis shards over the mesh ``pipe`` axis, so each pipe
    shard holds only layers/S layers' parameters (true pipeline memory
    partitioning, not replication);
  * execution goes through :func:`parallel.pipeline.pipeline_apply`
    (GPipe microbatch schedule, activations over the ICI ring via
    ``ppermute``) when a pipe mesh is present, and through one
    ``lax.scan`` over the layer axis otherwise — the parameter tree is
    identical either way, so a checkpoint moves freely between
    pipelined and unpipelined topologies;
  * side inputs that must travel with each microbatch (attention bias,
    dropout rng rows) ride the activation pytree — see
    ``pipeline_apply``'s tree contract.

The layer math mirrors ``TransformerEncoderModule``'s per-layer path
(pre-norm LN eps 1e-6, fused QKV, fp32 attention logits/softmax,
residual dropout), written over explicit stacked parameters.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _layer_norm(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    return out * scale + bias


def _dropout(key, rate, x):
    if rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def transformer_layer(lp, x, bias, key, *, num_heads: int,
                      attention_dropout: float, relu_dropout: float,
                      postprocess_dropout: float, train: bool):
    """One pre-norm [self-attention, FFN] layer over explicit params.

    ``lp``: single-layer parameter dict (leaves without the stack
    axis). ``key``: dropout PRNG key ((2,) uint32) or None when
    deterministic.
    """
    dtype = x.dtype
    dropping = train and key is not None
    if dropping:
        k0, k1, k2, k3 = jax.random.split(key, 4)
    drop = (lambda k, r, h: _dropout(k, r, h)) if dropping else \
        (lambda k, r, h: h)

    B, T, D = x.shape
    dh = D // num_heads
    h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"]).astype(dtype)
    qkv = h @ lp["qkv_kernel"].astype(dtype) + \
        lp["qkv_bias"].astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, num_heads, dh)
    k = k.reshape(B, T, num_heads, dh)
    v = v.reshape(B, T, num_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    w = drop(k0 if dropping else None, attention_dropout, w)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), v)
    o = o.reshape(B, T, D)
    o = o @ lp["out_kernel"].astype(dtype) + lp["out_bias"].astype(dtype)
    x = x + drop(k1 if dropping else None, postprocess_dropout, o)

    h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"]).astype(dtype)
    h = jax.nn.relu(h @ lp["ffn1_kernel"].astype(dtype) +
                    lp["ffn1_bias"].astype(dtype))
    h = drop(k2 if dropping else None, relu_dropout, h)
    h = h @ lp["ffn2_kernel"].astype(dtype) + lp["ffn2_bias"].astype(dtype)
    return x + drop(k3 if dropping else None, postprocess_dropout, h)


class PipelinedTransformerLayers(nn.Module):
    """Stacked-parameter transformer layer stack; pipelined over a
    mesh ``pipe`` axis when one is provided, plain layer-scan
    otherwise (identical parameters and numerics either way, up to
    dropout mask draws)."""
    num_layers: int
    hidden_size: int
    num_heads: int
    filter_size: int
    attention_dropout: float
    relu_dropout: float
    postprocess_dropout: float
    dtype_: Any
    num_microbatches: int = 4
    mesh: Any = None        # mesh carrying a "pipe" axis, or None

    @nn.compact
    def __call__(self, x, bias, train: bool = False):
        L, D, F = self.num_layers, self.hidden_size, self.filter_size
        lecun = nn.initializers.lecun_normal()
        p = {
            "ln1_scale": self.param("ln1_scale", nn.initializers.ones,
                                    (L, D), jnp.float32),
            "ln1_bias": self.param("ln1_bias", nn.initializers.zeros,
                                   (L, D), jnp.float32),
            "qkv_kernel": self.param("qkv_kernel", lecun, (L, D, 3 * D),
                                     jnp.float32),
            "qkv_bias": self.param("qkv_bias", nn.initializers.zeros,
                                   (L, 3 * D), jnp.float32),
            "out_kernel": self.param("out_kernel", lecun, (L, D, D),
                                     jnp.float32),
            "out_bias": self.param("out_bias", nn.initializers.zeros,
                                   (L, D), jnp.float32),
            "ln2_scale": self.param("ln2_scale", nn.initializers.ones,
                                    (L, D), jnp.float32),
            "ln2_bias": self.param("ln2_bias", nn.initializers.zeros,
                                   (L, D), jnp.float32),
            "ffn1_kernel": self.param("ffn1_kernel", lecun, (L, D, F),
                                      jnp.float32),
            "ffn1_bias": self.param("ffn1_bias", nn.initializers.zeros,
                                    (L, F), jnp.float32),
            "ffn2_kernel": self.param("ffn2_kernel", lecun, (L, F, D),
                                      jnp.float32),
            "ffn2_bias": self.param("ffn2_bias", nn.initializers.zeros,
                                    (L, D), jnp.float32),
        }
        dropping = train and (self.attention_dropout > 0 or
                              self.relu_dropout > 0 or
                              self.postprocess_dropout > 0)
        key = self.make_rng("dropout") if dropping else None

        layer_kw = dict(num_heads=self.num_heads,
                        attention_dropout=self.attention_dropout,
                        relu_dropout=self.relu_dropout,
                        postprocess_dropout=self.postprocess_dropout,
                        train=train)

        pipe_size = 0
        if self.mesh is not None and not self.is_initializing():
            pipe_size = self.mesh.shape.get("pipe", 0)
        if pipe_size > 1:
            return self._pipelined(p, x, bias, key, pipe_size, layer_kw)
        return self._scanned(p, x, bias, key, layer_kw)

    # -- plain path: lax.scan over the stacked layer axis -------------
    def _scanned(self, p, x, bias, key, layer_kw):
        def body(carry, inp):
            lp, i = inp
            k = None if key is None else jax.random.fold_in(key, i)
            return transformer_layer(lp, carry, bias, k,
                                     **layer_kw), None
        out, _ = jax.lax.scan(
            body, x, (p, jnp.arange(self.num_layers)))
        return out

    # -- pipelined path over the mesh's pipe axis ---------------------
    def _pipelined(self, p, x, bias, key, pipe_size, layer_kw):
        from ...parallel.pipeline import PIPE_AXIS, pipeline_apply
        S = pipe_size
        if self.num_layers % S != 0:
            raise ValueError(
                "num_layers {} not divisible by pipeline stages "
                "{}".format(self.num_layers, S))
        k_local = self.num_layers // S
        B = x.shape[0]
        tree = {"x": x, "bias": bias}
        if key is not None:
            # one key row per example; microbatch m uses its first row,
            # so masks differ per microbatch (and per layer via
            # fold_in below) — standard dropout semantics, drawn
            # microbatch-locally so the rows travel with their batch
            tree["rng"] = jax.random.split(key, B)

        def stage_fn(local, t):
            stage = jax.lax.axis_index(PIPE_AXIS)

            def body(carry, inp):
                lp, j = inp
                k = None
                if key is not None:
                    k = jax.random.fold_in(t["rng"][0],
                                           stage * k_local + j)
                return transformer_layer(lp, carry, t["bias"], k,
                                         **layer_kw), None
            y, _ = jax.lax.scan(body, t["x"],
                                (local, jnp.arange(k_local)))
            return {**t, "x": y}

        out = pipeline_apply(stage_fn, p, tree, mesh=self.mesh,
                             num_microbatches=self.num_microbatches)
        return out["x"]
