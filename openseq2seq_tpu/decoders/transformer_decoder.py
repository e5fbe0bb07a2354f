"""Transformer decoder (reference
`open_seq2seq/decoders/transformer_decoder.py:17-326`).

Train: parallel pass over shifted targets with a causal bias.
Infer: incremental decoding with an explicit KV-cache pytree inside a
jittable beam search (`ops/beam_search.py`) — the reference's
``predict`` + ``sequence_beam_search`` path (`transformer_decoder.py:
278-326`), with cross-attention K/V projected once per sequence instead
of per step.

The embedding/softmax table arrives via the encoder output dict
("embedding_table"), giving true three-way weight sharing.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .decoder import Decoder
from ..ops.beam_search import (NEG_INF, beam_search,
                               sequence_lengths_from_ids)
from ..parts.transformer.attention import CrossAttention, SelfAttention
from ..parts.transformer.common import (embed_ids,
                                        get_decoder_self_attention_bias,
                                        get_position_encoding,
                                        project_logits)
from ..parts.transformer.ffn import FeedForwardNetwork


class TransformerDecoderModule(nn.Module):
    num_hidden_layers: int
    hidden_size: int
    num_heads: int
    attention_dropout: float
    relu_dropout: float
    filter_size: int
    layer_postprocess_dropout: float
    tgt_vocab_size: int
    beam_size: int
    alpha: float
    extra_decode_length: int
    eos_id: int
    go_symbol: int
    dtype_: Any
    mode: str
    norm_params: Any = None
    use_flash: bool = False      # fused Pallas attention kernel (TPU)
    # lazy beam reordering: KV-cache rows never gather on reorders; an
    # ancestry matrix resolves history inside attention (ops/
    # beam_search.py). Equivalent outputs, ~3x less per-step cache
    # traffic on paper — but MEASURED SLOWER on v5e (11.45 vs 22.2
    # sent/s, both the per-head einsum and the head-merged layout):
    # the ancestry-resolved attention forces XLA into cache-transposing
    # dot layouts that cost more than the gathers saved. Kept as an
    # opt-in experiment; default stays on the eager-reorder schedule.
    lazy_decode: bool = False
    # "packed": ALL layers' decode K/V in ONE (B, T, 2*L*D) buffer,
    # head-merged so rows are lane-full (D=1024 vs dh=64 half-lane) —
    # L dus writes + ONE whole-buffer beam gather per step instead of
    # 2L each (the 10.4 ms/step profiled under "per_layer").
    # "per_layer": the round-2 list-of-{k,v} layout.
    decode_cache: str = "packed"
    # >1: prefix-bounded segmented decode — chain N while_loops whose
    # KV cache is time-sliced to a geometric ladder of bounds
    # (…T/4, T/2, T rounded to sublane multiples), so early steps read
    # a small cache instead of the full (·, T, ·) buffer. Exact (the
    # skipped rows are causally masked anyway); costs one XLA program
    # compile per segment. See ops/beam_search.py segment_bounds.
    decode_segments: int = 1
    sp_mesh: Any = None     # sequence parallelism for the TRAINING
                            # pass: shard the decoder residual stream's
                            # time axis over the mesh "model" axis
                            # (same Megatron-SP layout as the encoder);
                            # incremental decode (T=1) is untouched —
                            # the divisibility guard falls through
    pipeline_stages: int = 0     # >1: stacked-parameter layer stack,
                                 # GPipe-pipelined over the mesh "pipe"
                                 # axis in training; incremental decode
                                 # scans the same stacked params (see
                                 # PipelinedTransformerDecoderLayers)
    pipeline_microbatches: int = 4
    pipe_mesh: Any = None

    def _segment_bounds(self, max_len):
        if self.decode_segments <= 1 or \
                (self.lazy_decode and self.beam_size > 1):
            return None
        from ..ops.beam_search import geometric_segment_bounds
        return geometric_segment_bounds(max_len,
                                        self.decode_segments) or None

    def _sp(self, x):
        if self.sp_mesh is None or x.ndim != 3:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        msize = self.sp_mesh.shape.get("model", 1)
        if msize <= 1 or x.shape[1] % msize != 0:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.sp_mesh, P("data", "model", None)))

    def setup(self):
        L = self.num_hidden_layers
        from ..parts.transformer.common import make_norm as _mk_norm
        if self.pipeline_stages > 1:
            from ..parts.transformer.pipelined_stack import \
                PipelinedTransformerDecoderLayers
            self.pipeline_layers = PipelinedTransformerDecoderLayers(
                num_layers=L,
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                filter_size=self.filter_size,
                attention_dropout=self.attention_dropout,
                relu_dropout=self.relu_dropout,
                postprocess_dropout=self.layer_postprocess_dropout,
                dtype_=self.dtype_,
                num_microbatches=self.pipeline_microbatches,
                mesh=self.pipe_mesh,
                name="pipeline_layers")
            self.out_norm = _mk_norm(self.norm_params, self.dtype_)
            self.post_drop = Dropout(
                rate=self.layer_postprocess_dropout)
            return
        # the flash self-attention path replaces the triangular bias
        # with the kernel's causal mask; the plain fallback (and the
        # cached incremental-decode path) still consume the bias
        self.self_attns = [SelfAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            attention_dropout=self.attention_dropout, dtype=self.dtype_,
            use_flash=self.use_flash, causal=True)
            for _ in range(L)]
        self.cross_attns = [CrossAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            attention_dropout=self.attention_dropout, dtype=self.dtype_,
            use_flash=self.use_flash)
            for _ in range(L)]
        self.ffns = [FeedForwardNetwork(
            hidden_size=self.hidden_size, filter_size=self.filter_size,
            relu_dropout=self.relu_dropout, dtype=self.dtype_)
            for _ in range(L)]
        from ..parts.transformer.common import make_norm
        ln = lambda: make_norm(self.norm_params, self.dtype_)  # noqa: E731
        self.sa_norms = [ln() for _ in range(L)]
        self.ca_norms = [ln() for _ in range(L)]
        self.ffn_norms = [ln() for _ in range(L)]
        self.out_norm = ln()
        self.post_drop = Dropout(rate=self.layer_postprocess_dropout)

    # ------------------------------------------------------------------
    def _layer_stack(self, x, self_bias, enc_bias, memory, train,
                     caches: Optional[Dict] = None,
                     decode_pos=None):
        if self.pipeline_stages > 1:
            # stacked-parameter stack (GPipe-pipelined when the mesh
            # has a pipe axis); decode goes through decode() directly
            assert caches is None, \
                "pipelined decode is handled in decode()"
            x = self.pipeline_layers(x, self_bias, memory, enc_bias,
                                     train=train)
            return self.out_norm(x, train=train), None
        drop = lambda h: self.post_drop(h, deterministic=not train)  # noqa: E731
        ancestry = None if caches is None else caches.get("beam_ancestry")
        packed = None if caches is None else caches.get("self_kv")
        new_self_caches = []
        for i in range(self.num_hidden_layers):
            h = self.sa_norms[i](x, train=train)
            if packed is not None:
                h, packed = self.self_attns[i](
                    h, bias=self_bias, train=train,
                    decode_pos=decode_pos,
                    packed_cache=packed, layer_idx=i)
            else:
                h, new_c = self.self_attns[i](
                    h, bias=self_bias, train=train,
                    cache=None if caches is None else caches["self"][i],
                    decode_pos=decode_pos,
                    beam_ancestry=ancestry, beam_size=self.beam_size)
                new_self_caches.append(new_c)
            x = self._sp(x + drop(h))

            h = self.ca_norms[i](x, train=train)
            h = self.cross_attns[i](
                h, memory=memory, bias=enc_bias, train=train,
                kv_cache=None if caches is None else caches["cross"][i])
            x = self._sp(x + drop(h))

            h = self.ffn_norms[i](x, train=train)
            h = self.ffns[i](h, train=train)
            x = self._sp(x + drop(h))
            # layer-boundary remat anchor (model remat="blocks" policy)
            x = checkpoint_name(x, "block_boundary")
        return self.out_norm(x, train=train), \
            (packed if packed is not None else new_self_caches)

    def __call__(self, input_dict: Dict[str, Any], train: bool):
        enc = input_dict["encoder_output"]
        table = enc["embedding_table"]
        memory = enc["outputs"]
        enc_bias = enc["attention_bias"]

        if self.mode == "infer" or "target_tensors" not in input_dict \
                or input_dict.get("target_tensors") is None:
            return self.decode(enc)

        targets = input_dict["target_tensors"][0]
        dec_in = targets[:, :-1]
        T = dec_in.shape[1]
        x = embed_ids(table, dec_in, self.hidden_size, self.dtype_)
        pos = get_position_encoding(T, self.hidden_size)
        x = x + jnp.asarray(pos, self.dtype_)[None]
        x = self.post_drop(x, deterministic=not train)
        self_bias = jnp.asarray(get_decoder_self_attention_bias(T))

        x, _ = self._layer_stack(x, self_bias, enc_bias, memory, train)
        logits = project_logits(table, x, self.tgt_vocab_size)
        out = {"logits": logits, "targets": targets,
               "src_length": enc["src_length"]}
        if not train:
            out.update(self.decode(enc))
        return out

    # ------------------------------------------------------------------
    def _decode_stacked(self, enc, table, memory, enc_bias, B, max_len):
        """Beam decode over the stacked-parameter (pipelined) stack:
        a lax.scan over the layer axis per step against the packed
        (B, T, 2*L*D) KV buffer. The decode loop itself is not
        pipelined (no microbatch stream in autoregressive decoding);
        on a pipe mesh it runs with the stacked params broadcast."""
        L, D = self.num_hidden_layers, self.hidden_size
        positions = jnp.arange(max_len)
        pos_table = jnp.asarray(get_position_encoding(max_len, D),
                                self.dtype_)
        init_cache = {"self_kv": jnp.zeros((B, max_len, 2 * L * D),
                                           self.dtype_)}
        cross = self.pipeline_layers.precompute_cross_kv(memory)
        static_cache = {"cross_k": cross["k"], "cross_v": cross["v"],
                        "enc_bias": enc_bias}

        def symbols_to_logits_fn(ids, pos, cache):
            x = embed_ids(table, ids, D, self.dtype_)
            x = x + jax.lax.dynamic_slice_in_dim(
                pos_table, pos, 1, axis=0)[None]
            # length from the CACHE, not max_len: under segmented
            # decode the carried buffer holds only a time prefix
            Lc = cache["self_kv"].shape[1]
            self_bias_row = jnp.where(positions[:Lc] > pos, NEG_INF,
                                      0.0)[None, None, None, :]
            y, buf = self.pipeline_layers.decode_step(
                x, pos, cache["self_kv"], cache["cross_k"],
                cache["cross_v"], cache["enc_bias"], self_bias_row)
            y = self.out_norm(y, train=False)
            logits = project_logits(table, y[:, 0, :],
                                    self.tgt_vocab_size)
            return logits, {"self_kv": buf,
                            "cross_k": cache["cross_k"],
                            "cross_v": cache["cross_v"],
                            "enc_bias": cache["enc_bias"]}

        if self.is_initializing():
            dummy = jnp.zeros((B, 1), jnp.int32)
            symbols_to_logits_fn(dummy, 0,
                                 {**init_cache, **static_cache})
            zeros = jnp.zeros((B, max_len), jnp.int32)
            return {"outputs": [zeros, jnp.zeros((B,), jnp.int32)],
                    "scores": jnp.zeros((B,), jnp.float32),
                    "beams": jnp.zeros((B, self.beam_size, max_len + 1),
                                       jnp.int32)}

        decoded, scores = beam_search(
            symbols_to_logits_fn, init_cache,
            batch_size=B, beam_size=self.beam_size,
            vocab_size=self.tgt_vocab_size,
            max_decode_length=max_len, eos_id=self.eos_id,
            alpha=self.alpha, bos_id=self.go_symbol,
            static_cache=static_cache,
            segment_bounds=self._segment_bounds(max_len))
        top = decoded[:, 0, 1:]
        lengths = sequence_lengths_from_ids(top, self.eos_id)
        return {"outputs": [top, lengths], "scores": scores[:, 0],
                "beams": decoded}

    # ------------------------------------------------------------------
    def decode(self, enc: Dict[str, Any]) -> Dict[str, Any]:
        """Beam-search decode from encoder outputs."""
        table = enc["embedding_table"]
        memory = enc["outputs"]
        enc_bias = enc["attention_bias"]
        B, S, _ = memory.shape
        max_len = S + self.extra_decode_length
        h = self.num_heads
        dh = self.hidden_size // h

        if self.pipeline_stages > 1:
            return self._decode_stacked(enc, table, memory, enc_bias,
                                        B, max_len)

        lazy = self.lazy_decode and self.beam_size > 1
        packed = (not lazy) and self.decode_cache == "packed"
        # lazy mode keeps the cache head-merged (B, T, D): lane-full
        # rows, and _attend_lazy_beam's dots read it exactly as stored
        kv_shape = (B, max_len, self.hidden_size) if lazy \
            else (B, max_len, h, dh)
        if packed:
            init_cache = {
                "self_kv": jnp.zeros(
                    (B, max_len,
                     2 * self.num_hidden_layers * self.hidden_size),
                    self.dtype_),
            }
        else:
            init_cache = {
                "self": [{"k": jnp.zeros(kv_shape, self.dtype_),
                          "v": jnp.zeros(kv_shape, self.dtype_)}
                         for _ in range(self.num_hidden_layers)],
            }
        # beam-invariant: cross-attention KV over the encoder memory and
        # the encoder padding bias never change with beam reordering —
        # kept OUT of the gathered loop carry (they alone are ~400 MB at
        # transformer-big bs64, re-gathered twice per step before)
        static_cache = {
            "cross": [self.cross_attns[i].precompute_kv(memory)
                      for i in range(self.num_hidden_layers)],
            "enc_bias": enc_bias,
        }
        pos_table = jnp.asarray(
            get_position_encoding(max_len, self.hidden_size), self.dtype_)
        positions = jnp.arange(max_len)

        def symbols_to_logits_fn(ids, pos, cache):
            x = embed_ids(table, ids, self.hidden_size, self.dtype_)
            x = x + jax.lax.dynamic_slice_in_dim(
                pos_table, pos, 1, axis=0)[None]
            # length from the CACHE, not max_len: under segmented
            # decode the carried buffer holds only a time prefix
            Lc = (cache["self_kv"].shape[1] if "self_kv" in cache
                  else cache["self"][0]["k"].shape[1])
            self_bias = jnp.where(positions[:Lc] > pos, NEG_INF,
                                  0.0)[None, None, None, :]
            x, new_self = self._layer_stack(
                x, self_bias, cache["enc_bias"], None, train=False,
                caches=cache, decode_pos=pos)
            logits = project_logits(table, x[:, 0, :], self.tgt_vocab_size)
            new_cache = {"cross": cache["cross"],
                         "enc_bias": cache["enc_bias"]}
            if "self_kv" in cache:
                new_cache["self_kv"] = new_self
            else:
                new_cache["self"] = new_self
            if "beam_ancestry" in cache:
                new_cache["beam_ancestry"] = cache["beam_ancestry"]
            return logits, new_cache

        if self.is_initializing():
            # during init, run ONE eager decoder step to materialize all
            # params — flax cannot create params inside lax.while_loop.
            # Use eager-shaped (B, T, h, dh) caches: params are cache-
            # shape-independent and the plain path covers every module
            dummy = jnp.zeros((B, 1), jnp.int32)
            init_kv = {
                "self": [{"k": jnp.zeros((B, max_len, h, dh),
                                         self.dtype_),
                          "v": jnp.zeros((B, max_len, h, dh),
                                         self.dtype_)}
                         for _ in range(self.num_hidden_layers)],
            }
            symbols_to_logits_fn(dummy, 0, {**init_kv, **static_cache})
            zeros = jnp.zeros((B, max_len), jnp.int32)
            return {"outputs": [zeros, jnp.zeros((B,), jnp.int32)],
                    "scores": jnp.zeros((B,), jnp.float32),
                    "beams": jnp.zeros((B, self.beam_size, max_len + 1),
                                       jnp.int32)}

        decoded, scores = beam_search(
            symbols_to_logits_fn, init_cache,
            batch_size=B, beam_size=self.beam_size,
            vocab_size=self.tgt_vocab_size,
            max_decode_length=max_len, eos_id=self.eos_id,
            alpha=self.alpha, bos_id=self.go_symbol,
            static_cache=static_cache, lazy_cache=self.lazy_decode,
            segment_bounds=self._segment_bounds(max_len))

        top = decoded[:, 0, 1:]                       # strip BOS
        lengths = sequence_lengths_from_ids(top, self.eos_id)
        return {"outputs": [top, lengths], "scores": scores[:, 0],
                "beams": decoded}


class TransformerDecoder(Decoder):
    """Config wrapper; schema mirrors the reference's
    (`transformer_decoder.py:19-63`)."""

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "EOS_ID": int,
            "layer_postprocess_dropout": float,
            "num_hidden_layers": int,
            "hidden_size": int,
            "num_heads": int,
            "attention_dropout": float,
            "relu_dropout": float,
            "filter_size": int,
            "batch_size": int,
            "tgt_vocab_size": int,
            "beam_size": int,
            "alpha": float,
            "extra_decode_length": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Decoder.get_optional_params(), **{
            "GO_SYMBOL": int,
            "PAD_SYMBOL": int,
            "END_SYMBOL": int,
            "norm_params": dict,
            "use_flash_attention": bool,
            "lazy_decode": bool,
            "decode_cache": ["packed", "per_layer"],
            "decode_segments": int,
            "sequence_parallel": bool,
            "num_pipeline_stages": int,
            "num_pipeline_microbatches": int,
        })

    def make_module(self):
        p = self._params
        import jax.numpy as jnp
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        model_cfg = getattr(self._model, "params", {}) or {} \
            if self._model is not None else {}
        stages = int(p.get("num_pipeline_stages",
                           model_cfg.get("num_pipeline_stages", 0)) or 0)
        if stages > 1:
            explicit = "num_pipeline_stages" in p
            incompatible = [k for k in ("sequence_parallel",
                                        "use_flash_attention",
                                        "lazy_decode")
                            if p.get(k)]
            if p.get("norm_params", {}).get("type") == "batch_norm":
                incompatible.append("norm_params.batch_norm")
            if p["num_hidden_layers"] % stages != 0:
                incompatible.append(
                    "num_hidden_layers {} (must divide into {} "
                    "stages)".format(p["num_hidden_layers"], stages))
            if incompatible:
                if explicit:
                    raise ValueError(
                        "num_pipeline_stages is incompatible with {} "
                        "(the pipelined decoder stack is a homogeneous "
                        "pre-norm LN stack)".format(incompatible))
                # inherited from the model-level config: the encoder
                # may still pipeline — leave the decoder on the plain
                # per-layer path rather than fail the whole model
                from ..utils.logging import deco_print
                deco_print(
                    "WARNING: model-level num_pipeline_stages {} is "
                    "incompatible with decoder options {} — the decoder "
                    "stack will NOT be pipelined (set decoder_params/"
                    "num_pipeline_stages to force)".format(
                        stages, incompatible))
                stages = 0
        return TransformerDecoderModule(
            num_hidden_layers=p["num_hidden_layers"],
            hidden_size=p["hidden_size"],
            num_heads=p["num_heads"],
            attention_dropout=p["attention_dropout"],
            relu_dropout=p["relu_dropout"],
            filter_size=p["filter_size"],
            layer_postprocess_dropout=p["layer_postprocess_dropout"],
            tgt_vocab_size=p["tgt_vocab_size"],
            beam_size=p["beam_size"],
            alpha=p["alpha"],
            extra_decode_length=p["extra_decode_length"],
            eos_id=p["EOS_ID"],
            go_symbol=p.get("GO_SYMBOL", 2),
            dtype_=dtype,
            mode=self._mode,
            norm_params=p.get("norm_params"),
            use_flash=p.get("use_flash_attention", False),
            lazy_decode=p.get("lazy_decode", False),
            decode_cache=p.get("decode_cache", "packed"),
            decode_segments=int(p.get("decode_segments", 1)),
            sp_mesh=(self._model.mesh
                     if (p.get("sequence_parallel", False) and
                         self._model is not None and
                         self._model.mesh is not None) else None),
            pipeline_stages=stages,
            pipeline_microbatches=int(
                p.get("num_pipeline_microbatches",
                      model_cfg.get("num_pipeline_microbatches", 4))),
            pipe_mesh=(self._model.mesh
                       if (stages > 1 and self._model is not None)
                       else None))
