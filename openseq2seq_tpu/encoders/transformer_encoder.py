"""Transformer encoder (reference
`open_seq2seq/encoders/transformer_encoder.py:17-170`).

Shared embedding + sinusoidal positions, N pre-norm [self-attention,
FFN] layers, final layer norm. The shared embedding *table* is returned
in the output dict so the decoder reuses the identical parameter for
target embedding and softmax projection — the flax equivalent of the
reference handing its ``EmbeddingSharedWeights`` layer object to the
decoder through the encoder output.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .encoder import Encoder
from ..parts.transformer.attention import SelfAttention
from ..parts.transformer.common import (SharedEmbedding, get_padding_bias,
                                        get_position_encoding, make_norm)
from ..parts.transformer.ffn import FeedForwardNetwork, MoEFeedForward


class TransformerEncoderModule(nn.Module):
    encoder_layers: int
    hidden_size: int
    num_heads: int
    attention_dropout: float
    filter_size: int
    src_vocab_size: int
    relu_dropout: float
    layer_postprocess_dropout: float
    pad_embeddings_2_eight: bool
    dtype_: Any
    moe_num_experts: int = 0     # >0: switch-MoE FFNs (expert
                                 # parallelism over the model axis)
    moe_loss_weight: float = 0.01
    use_flash: bool = False      # fused Pallas attention kernel (TPU)
    norm_params: Any = None      # {"type": "batch_norm", ...} selects
                                 # the Transformer_BatchNorm variant
    sp_mesh: Any = None     # sequence parallelism: shard the residual
                            # stream's TIME axis over the mesh "model"
                            # axis (Megatron-SP); GSPMD inserts the
                            # all-gathers attention needs and keeps
                            # LN/dropout/FFN elementwise work sharded
    pipeline_stages: int = 0     # >1: run the layer stack as a GPipe
                                 # pipeline over the mesh "pipe" axis
                                 # (stacked-parameter stack, parts/
                                 # transformer/pipelined_stack.py)
    pipeline_microbatches: int = 4
    pipe_mesh: Any = None

    def _sp(self, x):
        if self.sp_mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        msize = self.sp_mesh.shape.get("model", 1)
        if msize <= 1 or x.shape[1] % msize != 0:
            # time axis must divide the model axis; configs enable
            # pad_lengths_to_eight for this — otherwise fall back to
            # the unconstrained layout (semantics are identical)
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.sp_mesh, P("data", "model", None)))

    def setup(self):
        self.embedding = SharedEmbedding(
            vocab_size=self.src_vocab_size, hidden_size=self.hidden_size,
            pad_vocab_to_eight=self.pad_embeddings_2_eight,
            dtype=self.dtype_)
        if self.pipeline_stages > 1:
            from ..parts.transformer.pipelined_stack import \
                PipelinedTransformerLayers
            self.pipeline_layers = PipelinedTransformerLayers(
                num_layers=self.encoder_layers,
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
            self.out_norm = make_norm(self.norm_params, self.dtype_)
            self.post_drop = Dropout(
                rate=self.layer_postprocess_dropout)
            return
        self.self_attns = [SelfAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            attention_dropout=self.attention_dropout, dtype=self.dtype_,
            use_flash=self.use_flash)
            for _ in range(self.encoder_layers)]
        if self.moe_num_experts > 0:
            self.ffns = [MoEFeedForward(
                hidden_size=self.hidden_size,
                filter_size=self.filter_size,
                num_experts=self.moe_num_experts,
                relu_dropout=self.relu_dropout, dtype=self.dtype_)
                for _ in range(self.encoder_layers)]
        else:
            self.ffns = [FeedForwardNetwork(
                hidden_size=self.hidden_size,
                filter_size=self.filter_size,
                relu_dropout=self.relu_dropout, dtype=self.dtype_)
                for _ in range(self.encoder_layers)]
        mknorm = lambda: make_norm(self.norm_params, self.dtype_)  # noqa: E731
        self.sa_norms = [mknorm() for _ in range(self.encoder_layers)]
        self.ffn_norms = [mknorm() for _ in range(self.encoder_layers)]
        self.out_norm = mknorm()
        self.post_drop = Dropout(rate=self.layer_postprocess_dropout)

    def __call__(self, input_dict: Dict[str, Any], train: bool):
        ids = input_dict["source_tensors"][0]
        lengths = input_dict["source_tensors"][1]
        B, T = ids.shape

        bias = get_padding_bias(ids)                 # (B,1,1,T) fp32
        x = self.embedding(ids)
        pos = get_position_encoding(T, self.hidden_size)
        x = x + jnp.asarray(pos, self.dtype_)[None, :, :]
        drop = lambda h: self.post_drop(h, deterministic=not train)  # noqa: E731
        x = self._sp(drop(x))

        if self.pipeline_stages > 1:
            x = self.pipeline_layers(x, bias, train=train)
            x = self.out_norm(x, train=train)
            return {"outputs": x,
                    "inputs": ids,
                    "src_length": lengths,
                    "attention_bias": bias,
                    "embedding_table": self.embedding.table()}

        moe_aux = 0.0
        for i in range(self.encoder_layers):
            h = self.sa_norms[i](x, train=train)
            h, _ = self.self_attns[i](h, bias=bias, train=train)
            x = self._sp(x + drop(h))
            h = self.ffn_norms[i](x, train=train)
            h = self.ffns[i](h, train=train)
            if self.moe_num_experts > 0:
                h, aux = h
                moe_aux = moe_aux + aux
            x = self._sp(x + drop(h))
            # layer-boundary remat anchor (model remat="blocks" policy)
            x = checkpoint_name(x, "block_boundary")
        x = self.out_norm(x, train=train)

        out = {"outputs": x,
               "inputs": ids,
               "src_length": lengths,
               "attention_bias": bias,
               "embedding_table": self.embedding.table()}
        if self.moe_num_experts > 0:
            out["moe_aux_loss"] = (self.moe_loss_weight * moe_aux /
                                   self.encoder_layers)
        return out


class TransformerEncoder(Encoder):
    """Config wrapper; schema mirrors the reference's."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "encoder_layers": int,
            "hidden_size": int,
            "num_heads": int,
            "attention_dropout": float,
            "filter_size": int,
            "src_vocab_size": int,
            "relu_dropout": float,
            "layer_postprocess_dropout": float,
            "remove_padding": bool,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "pad_embeddings_2_eight": bool,
            "norm_params": dict,
            "sequence_parallel": bool,
            "moe_num_experts": int,
            "moe_loss_weight": float,
            "use_flash_attention": bool,
            "num_pipeline_stages": int,
            "num_pipeline_microbatches": int,
        })

    def make_module(self):
        p = self._params
        model_cfg = getattr(self._model, "params", {}) or {} \
            if self._model is not None else {}
        stages = int(p.get("num_pipeline_stages",
                           model_cfg.get("num_pipeline_stages", 0)) or 0)
        if stages > 1:
            explicit = "num_pipeline_stages" in p
            incompatible = [k for k in ("moe_num_experts",
                                        "sequence_parallel",
                                        "use_flash_attention")
                            if p.get(k)]
            if p.get("norm_params", {}).get("type") == "batch_norm":
                incompatible.append("norm_params.batch_norm")
            if p["encoder_layers"] % stages != 0:
                incompatible.append(
                    "encoder_layers {} (must divide into {} "
                    "stages)".format(p["encoder_layers"], stages))
            if incompatible:
                if explicit:
                    raise ValueError(
                        "num_pipeline_stages is incompatible with {} "
                        "(the pipelined stack is a homogeneous pre-norm "
                        "LN stack)".format(incompatible))
                # inherited from the model-level config: warn and fall
                # back to the plain per-layer stack, mirroring the
                # decoder's behavior — an explicit encoder_params
                # setting still fails loudly above
                from ..utils.logging import deco_print
                deco_print(
                    "WARNING: model-level num_pipeline_stages {} is "
                    "incompatible with encoder options {} — the encoder "
                    "stack will NOT be pipelined (set encoder_params/"
                    "num_pipeline_stages to force)".format(
                        stages, incompatible))
                stages = 0
        return TransformerEncoderModule(
            encoder_layers=p["encoder_layers"],
            hidden_size=p["hidden_size"],
            num_heads=p["num_heads"],
            attention_dropout=p["attention_dropout"],
            filter_size=p["filter_size"],
            src_vocab_size=p["src_vocab_size"],
            relu_dropout=p["relu_dropout"],
            layer_postprocess_dropout=p["layer_postprocess_dropout"],
            pad_embeddings_2_eight=p.get("pad_embeddings_2_eight", False),
            dtype_=self.compute_dtype,
            moe_num_experts=p.get("moe_num_experts", 0),
            moe_loss_weight=p.get("moe_loss_weight", 0.01),
            use_flash=p.get("use_flash_attention", False),
            norm_params=p.get("norm_params"),
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
