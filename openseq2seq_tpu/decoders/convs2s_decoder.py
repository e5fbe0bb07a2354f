"""ConvS2S decoder (reference
`open_seq2seq/decoders/convs2s_decoder.py:20-416` +
`parts/convs2s/attention_wn_layer.py`).

Causal GLU conv blocks, each followed by multi-step dot-product
attention over the encoder (keys = conv outputs, values = outputs +
embeddings). Training is the parallel causal pass; inference re-runs
the causal stack over the growing prefix buffer inside the shared beam
search (O(T^2) but one jitted program — the reference's incremental
path has the same asymptotics through its shape-invariant loop).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp

from .decoder import Decoder
from ..encoders.convs2s_encoder import glu_conv_block, SCALE
from ..ops.beam_search import beam_search, sequence_lengths_from_ids

_NEG = -1e9


class ConvS2SDecoderModule(nn.Module):
    tgt_vocab_size: int
    tgt_emb_size: int
    out_emb_size: int
    conv_nchannels_kwidth: tuple
    embedding_dropout_keep_prob: float
    hidden_dropout_keep_prob: float
    out_dropout_keep_prob: float
    max_input_length: int
    go_symbol: int
    end_symbol: int
    beam_size: int
    alpha: float
    extra_decode_length: int
    dtype_: Any
    mode: str

    def _make_layers(self, emb_dim, enc_key_dim):
        """Create all submodules once (shared by the teacher-forced pass
        and the decode loop — inline re-creation would collide names)."""
        layers = []
        in_dim = emb_dim
        for i, (ch, k) in enumerate(self.conv_nchannels_kwidth):
            layers.append({
                "conv": nn.Conv(2 * ch, kernel_size=(k,),
                                padding="CAUSAL", dtype=self.dtype_,
                                param_dtype=jnp.float32,
                                name="conv{}".format(i + 1)),
                "res": (nn.Dense(ch, dtype=self.dtype_,
                                 param_dtype=jnp.float32,
                                 name="conv{}_res_proj".format(i + 1))
                        if in_dim != ch else None),
                "att_q": nn.Dense(enc_key_dim, dtype=self.dtype_,
                                  param_dtype=jnp.float32,
                                  name="att_q{}".format(i + 1)),
                "att_out": nn.Dense(ch, dtype=self.dtype_,
                                    param_dtype=jnp.float32,
                                    name="att_out{}".format(i + 1)),
            })
            in_dim = ch
        return layers

    def _stack(self, layers, dec_in, enc_keys, enc_values, enc_mask,
               train):
        """Causal conv + attention stack over decoder inputs (B, T, D)
        -> features (B, T, C_last)."""
        x = dec_in
        emb = dec_in
        for layer in layers:
            residual = x if layer["res"] is None else layer["res"](x)
            h = x
            if self.hidden_dropout_keep_prob < 1.0:
                h = Dropout(rate=1.0 - self.hidden_dropout_keep_prob,
                               deterministic=not train)(h)
            h = layer["conv"](h)
            a, b = jnp.split(h, 2, axis=-1)
            x = (a * jax.nn.sigmoid(b) + residual) * SCALE
            # attention: query = conv out (+ target embedding when dims
            # line up, the ConvS2S query combination)
            q = layer["att_q"](x)
            if emb.shape[-1] == q.shape[-1]:
                q = (q + emb) * SCALE
            scores = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32),
                                enc_keys.astype(jnp.float32))
            scores = jnp.where(enc_mask[:, None, :], scores, _NEG)
            align = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bts,bsd->btd", align,
                             enc_values.astype(jnp.float32))
            # scale by source length (ConvS2S trick)
            s = jnp.sum(enc_mask, axis=-1, keepdims=True)
            ctx = ctx * (s[:, :, None] * jnp.sqrt(1.0 / jnp.maximum(
                s[:, :, None], 1.0)))
            ctx = layer["att_out"](ctx.astype(self.dtype_))
            x = (x + ctx) * SCALE
        return x

    @nn.compact
    def __call__(self, input_dict: Dict[str, Any], train: bool):
        enc = input_dict["encoder_output"]
        enc_keys = enc["outputs"]
        enc_values = enc.get("attention_values", enc["outputs"])
        mem_len = enc["src_length"]
        B, S = enc_keys.shape[:2]
        enc_mask = jnp.arange(S)[None, :] < mem_len[:, None]

        tok = self.param("embedding", nn.initializers.normal(0.1),
                         (self.tgt_vocab_size, self.tgt_emb_size),
                         jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(0.1),
                         (self.max_input_length, self.tgt_emb_size),
                         jnp.float32)

        def embed(ids, offset=0):
            T = ids.shape[1]
            e = jnp.take(tok, ids, axis=0) + pos[None, offset:offset + T]
            return e.astype(self.dtype_)

        layers = self._make_layers(self.tgt_emb_size,
                                   enc_keys.shape[-1])
        pre_out = nn.Dense(self.out_emb_size, dtype=self.dtype_,
                           param_dtype=jnp.float32, name="pre_out")
        out_proj = nn.Dense(self.tgt_vocab_size, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="out")

        def project(x, train_):
            h = pre_out(x)
            h = Dropout(rate=1.0 - self.out_dropout_keep_prob,
                           deterministic=not train_)(h)
            return out_proj(h.astype(jnp.float32))

        out: Dict[str, Any] = {"src_length": mem_len}
        targets = input_dict.get("target_tensors")
        if targets is not None and self.mode != "infer":
            y = targets[0]
            dec_in = embed(y[:, :-1])
            dec_in = Dropout(
                rate=1.0 - self.embedding_dropout_keep_prob,
                deterministic=not train)(dec_in)
            feats = self._stack(layers, dec_in, enc_keys,
                                enc_values, enc_mask, train)
            out["logits"] = project(feats, train)
            out["targets"] = y

        if self.mode != "train":
            max_len = S + self.extra_decode_length
            init_cache = {
                "ids": jnp.full((B, max_len), self.go_symbol, jnp.int32),
            }
            # beam-invariant encoder tensors: tiled once by
            # beam_search, never re-gathered per step
            static_cache = {
                "enc_keys": enc_keys,
                "enc_values": enc_values,
                "enc_mask": enc_mask,
            }

            def symbols_to_logits_fn(ids, pos_i, cache):
                buf = jax.lax.dynamic_update_slice(
                    cache["ids"], ids, (0, pos_i))
                dec_in = embed(buf)
                feats = self._stack(layers, dec_in, cache["enc_keys"],
                                    cache["enc_values"],
                                    cache["enc_mask"], False)
                logits_t = jax.lax.dynamic_slice_in_dim(
                    project(feats, False), pos_i, 1, axis=1)[:, 0]
                return logits_t, dict(cache, ids=buf)

            if self.is_initializing():
                symbols_to_logits_fn(
                    jnp.zeros((B, 1), jnp.int32), 0,
                    {**init_cache, **static_cache})
                zeros = jnp.zeros((B, max_len), jnp.int32)
                out.setdefault("outputs",
                               [zeros, jnp.zeros((B,), jnp.int32)])
                return out

            decoded, scores = beam_search(
                symbols_to_logits_fn, init_cache, batch_size=B,
                beam_size=self.beam_size,
                vocab_size=self.tgt_vocab_size,
                max_decode_length=max_len, eos_id=self.end_symbol,
                alpha=self.alpha, bos_id=self.go_symbol,
                static_cache=static_cache)
            top = decoded[:, 0, 1:]
            lengths = sequence_lengths_from_ids(top, self.end_symbol)
            out["outputs"] = [top, lengths]
            out["scores"] = scores[:, 0]
        return out


class ConvS2SDecoder(Decoder):
    """Config wrapper (reference `convs2s_decoder.py:26-64`)."""

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "batch_size": int,
            "tgt_emb_size": int,
            "tgt_vocab_size": int,
            "shared_embed": bool,
            "embedding_dropout_keep_prob": float,
            "conv_nchannels_kwidth": list,
            "hidden_dropout_keep_prob": float,
            "out_dropout_keep_prob": float,
            "beam_size": int,
            "alpha": float,
            "extra_decode_length": int,
            "EOS_ID": int,
            "GO_SYMBOL": int,
            "out_emb_size": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Decoder.get_optional_params(), **{
            "pad_embeddings_2_eight": bool,
            "att_layer_num": int,
            "max_input_length": int,
            "PAD_SYMBOL": int,
            "END_SYMBOL": int,
            "conv_activation": None,
            "normalization_type": str,
            "scaling_factor": float,
            "init_var": None,
        })

    def make_module(self):
        p = self._params
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        return ConvS2SDecoderModule(
            tgt_vocab_size=p["tgt_vocab_size"],
            tgt_emb_size=p["tgt_emb_size"],
            out_emb_size=p["out_emb_size"],
            conv_nchannels_kwidth=tuple(map(tuple,
                                            p["conv_nchannels_kwidth"])),
            embedding_dropout_keep_prob=p["embedding_dropout_keep_prob"],
            hidden_dropout_keep_prob=p["hidden_dropout_keep_prob"],
            out_dropout_keep_prob=p["out_dropout_keep_prob"],
            max_input_length=p.get("max_input_length", 1024),
            go_symbol=p["GO_SYMBOL"],
            end_symbol=p["EOS_ID"],
            beam_size=p["beam_size"],
            alpha=p["alpha"],
            extra_decode_length=p["extra_decode_length"],
            dtype_=dtype,
            mode=self._mode)
