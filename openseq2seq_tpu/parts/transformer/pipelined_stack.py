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
    # honors the model's dropout_bits / dropout_remat settings (bound
    # at trace time by Model.loss_fn), same as every flax Dropout site
    from ..dropout import functional_dropout
    return functional_dropout(key, rate, x)


def _psum_if(x, tp_axis):
    return x if tp_axis is None else jax.lax.psum(x, tp_axis)


def stacked_param_specs(params, model_axis=None):
    """PartitionSpec per stacked-stack leaf: always P(pipe, ...) on the
    layer axis; with ``model_axis`` the Megatron TP layout on top —
    column-parallel QKV/query/FFN-in kernels (their biases sharded
    alike), row-parallel output/FFN-out kernels (biases replicated,
    added after the psum), layer norms replicated."""
    from ...parallel.pipeline import PIPE_AXIS
    from jax.sharding import PartitionSpec as P
    COL3K = {"qkv_kernel"}
    COL3B = {"qkv_bias"}
    ROWK = {"out_kernel", "sa_out_kernel", "ca_out_kernel",
            "ffn2_kernel"}
    COLK = {"q_kernel", "ck_kernel", "cv_kernel", "ffn1_kernel"}
    COLB = {"q_bias", "ck_bias", "cv_bias", "ffn1_bias"}

    def spec(path, leaf):
        name = path[-1]
        for attr in ("key", "name", "idx"):
            if hasattr(name, attr):
                name = str(getattr(name, attr))
                break
        else:
            name = str(name)
        m = model_axis
        if m is not None:
            if name in COL3K:
                return P(PIPE_AXIS, None, None, m)
            if name in COL3B:
                return P(PIPE_AXIS, None, m)
            if name in ROWK:
                return P(PIPE_AXIS, m, None)
            if name in COLK:
                return P(PIPE_AXIS, None, m)
            if name in COLB:
                return P(PIPE_AXIS, m)
        return P(*((PIPE_AXIS,) + (None,) * (leaf.ndim - 1)))
    # tree_map (not a dict comprehension): the returned spec tree must
    # be the SAME container type as ``params`` (dict vs FrozenDict) or
    # shard_map's in_specs prefix matching rejects it
    return jax.tree_util.tree_map_with_path(spec, params)


def transformer_layer(lp, x, bias, key, *, num_heads: int,
                      attention_dropout: float, relu_dropout: float,
                      postprocess_dropout: float, train: bool,
                      tp_axis: Optional[str] = None):
    """One pre-norm [self-attention, FFN] layer over explicit params.

    ``lp``: single-layer parameter dict (leaves without the stack
    axis). ``key``: dropout PRNG key ((2,) uint32) or None when
    deterministic. ``tp_axis``: mesh axis name for Megatron tensor
    parallelism — kernels arrive as local column/row shards (see
    ``stacked_param_specs``), attention runs on the local head slice,
    and the output/FFN projections psum over the axis. Dropout on
    SHARDED tensors (attention weights, FFN hidden) folds the shard
    index into its key so masks decorrelate; dropout on the REPLICATED
    residual stream keeps the shared key so replicas stay identical.
    """
    dtype = x.dtype
    dropping = train and key is not None
    if dropping:
        k0, k1, k2, k3 = jax.random.split(key, 4)
        if tp_axis is not None:
            shard = jax.lax.axis_index(tp_axis)
            k0 = jax.random.fold_in(k0, shard)
            k2 = jax.random.fold_in(k2, shard)
    drop = (lambda k, r, h: _dropout(k, r, h)) if dropping else \
        (lambda k, r, h: h)

    B, T, D = x.shape
    dh = D // num_heads
    h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"]).astype(dtype)
    qkv = jnp.einsum("btd,dce->btce", h,
                     lp["qkv_kernel"].astype(dtype)) + \
        lp["qkv_bias"].astype(dtype)               # (B, T, 3, Dlocal)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    hl = q.shape[-1] // dh                         # local heads
    q = q.reshape(B, T, hl, dh)
    k = k.reshape(B, T, hl, dh)
    v = v.reshape(B, T, hl, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    w = drop(k0 if dropping else None, attention_dropout, w)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), v)
    o = o.reshape(B, T, hl * dh)
    o = _psum_if(o @ lp["out_kernel"].astype(dtype), tp_axis) + \
        lp["out_bias"].astype(dtype)
    x = x + drop(k1 if dropping else None, postprocess_dropout, o)

    h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"]).astype(dtype)
    h = jax.nn.relu(h @ lp["ffn1_kernel"].astype(dtype) +
                    lp["ffn1_bias"].astype(dtype))
    h = drop(k2 if dropping else None, relu_dropout, h)
    h = _psum_if(h @ lp["ffn2_kernel"].astype(dtype), tp_axis) + \
        lp["ffn2_bias"].astype(dtype)
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
            # (L, D, 3, D), not (L, D, 3D): the q/k/v blocks must be
            # separately shardable for column-parallel TP (a flat 3D
            # axis cut into m chunks would mix q/k/v across shards)
            "qkv_kernel": self.param("qkv_kernel", lecun, (L, D, 3, D),
                                     jnp.float32),
            "qkv_bias": self.param("qkv_bias", nn.initializers.zeros,
                                   (L, 3, D), jnp.float32),
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

        pipe_size = tp_size = 0
        if self.mesh is not None and not self.is_initializing():
            pipe_size = self.mesh.shape.get("pipe", 0)
            tp_size = self.mesh.shape.get("model", 0)
        if pipe_size > 1:
            return self._pipelined(p, x, bias, key, pipe_size, tp_size,
                                   layer_kw)
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
    def _pipelined(self, p, x, bias, key, pipe_size, tp_size, layer_kw):
        from ...parallel.pipeline import PIPE_AXIS, pipeline_apply
        S = pipe_size
        if self.num_layers % S != 0:
            raise ValueError(
                "num_layers {} not divisible by pipeline stages "
                "{}".format(self.num_layers, S))
        tp = "model" if tp_size > 1 else None
        if tp and (self.num_heads % tp_size or
                   self.filter_size % tp_size):
            raise ValueError(
                "TP x PP: num_heads {} and filter_size {} must divide "
                "the model axis {}".format(self.num_heads,
                                           self.filter_size, tp_size))
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
                                         tp_axis=tp, **layer_kw), None
            y, _ = jax.lax.scan(body, t["x"],
                                (local, jnp.arange(k_local)))
            return {**t, "x": y}

        out = pipeline_apply(stage_fn, p, tree, mesh=self.mesh,
                             num_microbatches=self.num_microbatches,
                             param_specs=stacked_param_specs(
                                 p, model_axis=tp))
        return out["x"]


# ---------------------------------------------------------------------
# Decoder stack: pre-norm [causal self-attention, cross-attention, FFN]
# ---------------------------------------------------------------------

def transformer_decoder_layer(lp, x, self_bias, memory, enc_bias, key,
                              *, num_heads: int,
                              attention_dropout: float,
                              relu_dropout: float,
                              postprocess_dropout: float, train: bool,
                              tp_axis: Optional[str] = None):
    """One pre-norm decoder layer over explicit params — the stacked-
    parameter counterpart of ``TransformerDecoderModule``'s per-layer
    path (reference `open_seq2seq/decoders/transformer_decoder.py:
    160-210`): causal self-attention, encoder-decoder attention, FFN,
    each with a residual + postprocess dropout. ``tp_axis``: Megatron
    tensor parallelism over local head/FFN shards — see
    ``transformer_layer`` for the dropout-key discipline."""
    dtype = x.dtype
    dropping = train and key is not None
    if dropping:
        ks = list(jax.random.split(key, 6))
        if tp_axis is not None:
            shard = jax.lax.axis_index(tp_axis)
            for i in (0, 2, 4):      # sharded-tensor dropout sites
                ks[i] = jax.random.fold_in(ks[i], shard)
    drop = (lambda k, r, h: _dropout(k, r, h)) if dropping else \
        (lambda k, r, h: h)
    B, T, D = x.shape
    dh = D // num_heads
    scale = dh ** -0.5

    # causal self-attention (fused QKV, column-parallel under TP)
    h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"]).astype(dtype)
    qkv = jnp.einsum("btd,dce->btce", h,
                     lp["qkv_kernel"].astype(dtype)) + \
        lp["qkv_bias"].astype(dtype)               # (B, T, 3, Dlocal)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    hl = q.shape[-1] // dh                         # local heads
    q = q.reshape(B, T, hl, dh)
    k = k.reshape(B, T, hl, dh)
    v = v.reshape(B, T, hl, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    logits = logits + self_bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    w = drop(ks[0] if dropping else None, attention_dropout, w)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), v)
    o = _psum_if(o.reshape(B, T, hl * dh) @
                 lp["sa_out_kernel"].astype(dtype), tp_axis) + \
        lp["sa_out_bias"].astype(dtype)
    x = x + drop(ks[1] if dropping else None, postprocess_dropout, o)

    # encoder-decoder attention
    h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"]).astype(dtype)
    q = (h @ lp["q_kernel"].astype(dtype) +
         lp["q_bias"].astype(dtype)).reshape(B, T, hl, dh)
    S = memory.shape[1]
    kc = (memory @ lp["ck_kernel"].astype(dtype) +
          lp["ck_bias"].astype(dtype)).reshape(B, S, hl, dh)
    vc = (memory @ lp["cv_kernel"].astype(dtype) +
          lp["cv_bias"].astype(dtype)).reshape(B, S, hl, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, kc,
                        preferred_element_type=jnp.float32)
    logits = logits + enc_bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    w = drop(ks[2] if dropping else None, attention_dropout, w)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), vc)
    o = _psum_if(o.reshape(B, T, hl * dh) @
                 lp["ca_out_kernel"].astype(dtype), tp_axis) + \
        lp["ca_out_bias"].astype(dtype)
    x = x + drop(ks[3] if dropping else None, postprocess_dropout, o)

    # FFN
    h = _layer_norm(x, lp["ln3_scale"], lp["ln3_bias"]).astype(dtype)
    h = jax.nn.relu(h @ lp["ffn1_kernel"].astype(dtype) +
                    lp["ffn1_bias"].astype(dtype))
    h = drop(ks[4] if dropping else None, relu_dropout, h)
    h = _psum_if(h @ lp["ffn2_kernel"].astype(dtype), tp_axis) + \
        lp["ffn2_bias"].astype(dtype)
    return x + drop(ks[5] if dropping else None, postprocess_dropout, h)


class PipelinedTransformerDecoderLayers(nn.Module):
    """Stacked-parameter decoder layer stack (see the encoder-side
    class above for the layout rationale). Adds what the decoder
    needs beyond the encoder stack:

      * cross-attention over the encoder memory — the memory and its
        padding bias travel with each microbatch through the pipeline;
      * an incremental ``decode_step`` that runs the same stacked
        params through a ``lax.scan`` over the layer axis against the
        PACKED (B, T, 2*L*D) beam-search KV buffer (the decode loop
        itself is not pipelined — autoregressive steps have no
        microbatch dimension to stream; on a pipe mesh the scan just
        runs replicated).
    """
    num_layers: int
    hidden_size: int
    num_heads: int
    filter_size: int
    attention_dropout: float
    relu_dropout: float
    postprocess_dropout: float
    dtype_: Any
    num_microbatches: int = 4
    mesh: Any = None

    def setup(self):
        L, D, F = self.num_layers, self.hidden_size, self.filter_size
        lecun = nn.initializers.lecun_normal()
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        mk = lambda name, init, shape: self.param(  # noqa: E731
            name, init, shape, jnp.float32)
        self.p = {
            "ln1_scale": mk("ln1_scale", ones, (L, D)),
            "ln1_bias": mk("ln1_bias", zeros, (L, D)),
            # (L, D, 3, D) so q/k/v shard separately under TP (see the
            # encoder stack above)
            "qkv_kernel": mk("qkv_kernel", lecun, (L, D, 3, D)),
            "qkv_bias": mk("qkv_bias", zeros, (L, 3, D)),
            "sa_out_kernel": mk("sa_out_kernel", lecun, (L, D, D)),
            "sa_out_bias": mk("sa_out_bias", zeros, (L, D)),
            "ln2_scale": mk("ln2_scale", ones, (L, D)),
            "ln2_bias": mk("ln2_bias", zeros, (L, D)),
            "q_kernel": mk("q_kernel", lecun, (L, D, D)),
            "q_bias": mk("q_bias", zeros, (L, D)),
            "ck_kernel": mk("ck_kernel", lecun, (L, D, D)),
            "ck_bias": mk("ck_bias", zeros, (L, D)),
            "cv_kernel": mk("cv_kernel", lecun, (L, D, D)),
            "cv_bias": mk("cv_bias", zeros, (L, D)),
            "ca_out_kernel": mk("ca_out_kernel", lecun, (L, D, D)),
            "ca_out_bias": mk("ca_out_bias", zeros, (L, D)),
            "ln3_scale": mk("ln3_scale", ones, (L, D)),
            "ln3_bias": mk("ln3_bias", zeros, (L, D)),
            "ffn1_kernel": mk("ffn1_kernel", lecun, (L, D, F)),
            "ffn1_bias": mk("ffn1_bias", zeros, (L, F)),
            "ffn2_kernel": mk("ffn2_kernel", lecun, (L, F, D)),
            "ffn2_bias": mk("ffn2_bias", zeros, (L, D)),
        }

    def _layer_kw(self, train):
        return dict(num_heads=self.num_heads,
                    attention_dropout=self.attention_dropout,
                    relu_dropout=self.relu_dropout,
                    postprocess_dropout=self.postprocess_dropout,
                    train=train)

    def __call__(self, x, self_bias, memory, enc_bias,
                 train: bool = False):
        dropping = train and (self.attention_dropout > 0 or
                              self.relu_dropout > 0 or
                              self.postprocess_dropout > 0)
        key = self.make_rng("dropout") if dropping else None
        layer_kw = self._layer_kw(train)

        pipe_size = tp_size = 0
        if self.mesh is not None and not self.is_initializing():
            pipe_size = self.mesh.shape.get("pipe", 0)
            tp_size = self.mesh.shape.get("model", 0)
        if pipe_size > 1:
            return self._pipelined(x, self_bias, memory, enc_bias, key,
                                   pipe_size, tp_size, layer_kw)
        return self._scanned(x, self_bias, memory, enc_bias, key,
                             layer_kw)

    def _scanned(self, x, self_bias, memory, enc_bias, key, layer_kw):
        def body(carry, inp):
            lp, i = inp
            k = None if key is None else jax.random.fold_in(key, i)
            return transformer_decoder_layer(
                lp, carry, self_bias, memory, enc_bias, k,
                **layer_kw), None
        out, _ = jax.lax.scan(
            body, x, (self.p, jnp.arange(self.num_layers)))
        return out

    def _pipelined(self, x, self_bias, memory, enc_bias, key,
                   pipe_size, tp_size, layer_kw):
        from ...parallel.pipeline import PIPE_AXIS, pipeline_apply
        S = pipe_size
        if self.num_layers % S != 0:
            raise ValueError(
                "num_layers {} not divisible by pipeline stages "
                "{}".format(self.num_layers, S))
        tp = "model" if tp_size > 1 else None
        if tp and (self.num_heads % tp_size or
                   self.filter_size % tp_size):
            raise ValueError(
                "TP x PP: num_heads {} and filter_size {} must divide "
                "the model axis {}".format(self.num_heads,
                                           self.filter_size, tp_size))
        k_local = self.num_layers // S
        B = x.shape[0]
        # self_bias is the (1, 1, T, T) causal triangle — a trace
        # constant, identical for every microbatch, so it rides the
        # stage closure instead of the microbatch tree
        tree = {"x": x, "mem": memory, "enc_bias": enc_bias}
        if key is not None:
            tree["rng"] = jax.random.split(key, B)

        def stage_fn(local, t):
            stage = jax.lax.axis_index(PIPE_AXIS)

            def body(carry, inp):
                lp, j = inp
                k = None
                if key is not None:
                    k = jax.random.fold_in(t["rng"][0],
                                           stage * k_local + j)
                return transformer_decoder_layer(
                    lp, carry, self_bias, t["mem"], t["enc_bias"], k,
                    tp_axis=tp, **layer_kw), None
            y, _ = jax.lax.scan(body, t["x"],
                                (local, jnp.arange(k_local)))
            return {**t, "x": y}

        out = pipeline_apply(stage_fn, self.p, tree, mesh=self.mesh,
                             num_microbatches=self.num_microbatches,
                             param_specs=stacked_param_specs(
                                 self.p, model_axis=tp))
        return out["x"]

    # -- incremental decode against the packed (B, T, 2*L*D) cache --
    def precompute_cross_kv(self, memory):
        """All layers' cross-attention K/V in one shot:
        (B, L, S, D) each — batch-first so beam search can treat them
        as beam-invariant static cache entries."""
        dtype = self.dtype_
        k = jnp.einsum("bsd,lde->blse", memory.astype(dtype),
                       self.p["ck_kernel"].astype(dtype)) + \
            self.p["ck_bias"].astype(dtype)[None, :, None, :]
        v = jnp.einsum("bsd,lde->blse", memory.astype(dtype),
                       self.p["cv_kernel"].astype(dtype)) + \
            self.p["cv_bias"].astype(dtype)[None, :, None, :]
        return {"k": k, "v": v}

    def decode_step(self, x, decode_pos, packed_kv, cross_k, cross_v,
                    enc_bias, self_bias_row):
        """One incremental decoder step over all L layers.

        x (B, 1, D); packed_kv (B, T, 2*L*D) — the 3-D packed cache
        layout (see ``SelfAttention``: layer l's K at columns
        [2lD, (2l+1)D), V at [(2l+1)D, (2l+2)D)); cross_k/v
        (B, L, S, D); self_bias_row broadcastable (B?|1, 1, 1, T).
        Returns (y (B, 1, D), new packed_kv).
        """
        nh = self.num_heads
        dh = self.hidden_size // nh
        dtype = self.dtype_
        scale = dh ** -0.5
        B = x.shape[0]
        kw = self._layer_kw(train=False)

        def body(carry, inp):
            h_in, buf = carry
            lp, l = inp
            # --- causal self-attention against the packed buffer
            h = _layer_norm(h_in, lp["ln1_scale"],
                            lp["ln1_bias"]).astype(dtype)
            qkv = jnp.einsum("btd,dce->btce", h,
                             lp["qkv_kernel"].astype(dtype)) + \
                lp["qkv_bias"].astype(dtype)         # (B,1,3,D)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            D = self.hidden_size
            col = 2 * l * D
            upd = jnp.concatenate([k, v], axis=-1)       # (B,1,2D)
            buf = jax.lax.dynamic_update_slice(
                buf, upd.astype(buf.dtype), (0, decode_pos, col))
            kl = jax.lax.dynamic_slice(
                buf, (0, 0, col), (B, buf.shape[1], 2 * D))
            k_full = kl[:, :, :D].reshape(B, -1, nh, dh)
            v_full = kl[:, :, D:].reshape(B, -1, nh, dh)
            q4 = q.reshape(B, 1, nh, dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q4 * scale, k_full,
                                preferred_element_type=jnp.float32)
            logits = logits + self_bias_row.astype(jnp.float32)
            w = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), v_full)
            o = o.reshape(B, 1, -1) @ lp["sa_out_kernel"].astype(dtype) \
                + lp["sa_out_bias"].astype(dtype)
            h_in = h_in + o
            # --- cross-attention against precomputed per-layer K/V
            h = _layer_norm(h_in, lp["ln2_scale"],
                            lp["ln2_bias"]).astype(dtype)
            q4 = (h @ lp["q_kernel"].astype(dtype) +
                  lp["q_bias"].astype(dtype)).reshape(B, 1, nh, dh)
            kc = jax.lax.dynamic_index_in_dim(
                cross_k, l, axis=1)[:, 0].reshape(
                B, -1, nh, dh)
            vc = jax.lax.dynamic_index_in_dim(
                cross_v, l, axis=1)[:, 0].reshape(
                B, -1, nh, dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q4 * scale, kc,
                                preferred_element_type=jnp.float32)
            logits = logits + enc_bias.astype(jnp.float32)
            w = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), vc)
            o = o.reshape(B, 1, -1) @ lp["ca_out_kernel"].astype(dtype) \
                + lp["ca_out_bias"].astype(dtype)
            h_in = h_in + o
            # --- FFN
            h = _layer_norm(h_in, lp["ln3_scale"],
                            lp["ln3_bias"]).astype(dtype)
            h = jax.nn.relu(h @ lp["ffn1_kernel"].astype(dtype) +
                            lp["ffn1_bias"].astype(dtype))
            h = h @ lp["ffn2_kernel"].astype(dtype) + \
                lp["ffn2_bias"].astype(dtype)
            return (h_in + h, buf), None

        (y, new_buf), _ = jax.lax.scan(
            body, (x, packed_kv), (self.p, jnp.arange(self.num_layers)))
        return y, new_buf
