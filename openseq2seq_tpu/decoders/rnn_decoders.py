"""RNN decoders with attention for NMT (reference
`open_seq2seq/decoders/rnn_decoders.py:22-532` +
`parts/rnns/attention_wrapper.py`).

  * :class:`RNNDecoderWithAttention` — embedding + attention
    (bahdanau / luong / gnmt / gnmt_v2) + LSTM stack; teacher-forced
    training pass and greedy inference.
  * :class:`BeamSearchRNNDecoderWithAttention` — same cell driven by the
    jittable beam search (`ops/beam_search.py`) with a state cache
    (LSTM carries + attention context) instead of TF's tiled-batch
    BeamSearchDecoder.

Like the Tacotron decoder, the recurrent cell uses raw ``self.param``
tensors so both the teacher-forced pass and the decode loop are single
``lax.scan`` / ``while_loop`` programs.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import Decoder
from ..ops.beam_search import (NEG_INF, beam_search,
                               sequence_lengths_from_ids)

_NEG = -1e9


class RNNAttnDecoderModule(nn.Module):
    tgt_vocab_size: int
    tgt_emb_size: int
    attention_layer_size: int
    attention_type: str          # bahdanau|luong|gnmt|gnmt_v2
    decoder_layers: int
    cell_units: int
    cell_type: str
    use_skip_connections: bool
    go_symbol: int
    end_symbol: int
    beam_width: int
    length_penalty: float
    input_keep_prob: float
    output_keep_prob: float
    weight_tied: bool
    sampling_prob: float
    dtype_: Any
    mode: str

    # ------------------------------------------------------------------
    def _lstm_cell(self, params, state, x):
        wx, wh, b = params
        h_prev, c_prev = state
        gates = x @ wx + h_prev @ wh + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c_prev + \
            jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    def _attend(self, att, query, keys, memory, mem_mask):
        if self.attention_type == "luong":
            scores = jnp.einsum("bh,bsh->bs", query, keys)
        else:  # bahdanau / gnmt*
            q = (query @ att["q"])[:, None, :]          # (B,1,A)
            e = jnp.tanh(q + keys + att["b"])
            scores = jnp.einsum("bsa,a->bs", e, att["v"])
        scores = jnp.where(mem_mask, scores, _NEG)
        align = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bs,bse->be", align, memory)
        return context, align

    @nn.compact
    def __call__(self, input_dict: Dict[str, Any], train: bool):
        enc = input_dict["encoder_output"]
        memory = enc["outputs"].astype(jnp.float32)
        mem_len = enc["src_length"]
        B, S, E = memory.shape
        H = self.cell_units
        V = self.tgt_vocab_size
        D = self.tgt_emb_size
        A = self.attention_layer_size
        mem_mask = jnp.arange(S)[None, :] < mem_len[:, None]
        init = nn.initializers.xavier_uniform()

        embedding = self.param("embedding",
                               nn.initializers.normal(D ** -0.5),
                               (V, D), jnp.float32)

        # attention parameters + projected memory keys
        if self.attention_type == "luong":
            keys = nn.Dense(H, use_bias=False, dtype=jnp.float32,
                            param_dtype=jnp.float32,
                            name="luong_keys")(memory)
            att = {}
        else:
            keys = nn.Dense(A, dtype=jnp.float32,
                            param_dtype=jnp.float32,
                            name="bahdanau_keys")(memory)
            att = {
                "q": self.param("att_q", init, (H, A), jnp.float32),
                "v": self.param("att_v", nn.initializers.normal(0.1),
                                (A,), jnp.float32),
                "b": self.param("att_b", nn.initializers.zeros, (A,),
                                jnp.float32),
            }

        # LSTM stack params
        lstm_params = []
        for i in range(self.decoder_layers):
            if i == 0:
                d_in = D + E
            elif self.attention_type == "gnmt_v2" or \
                    (self.attention_type == "gnmt" and i == 1):
                d_in = H + E
            else:
                d_in = H
            lstm_params.append((
                self.param("lstm{}_wx".format(i + 1), init, (d_in, 4 * H),
                           jnp.float32),
                self.param("lstm{}_wh".format(i + 1),
                           nn.initializers.orthogonal(), (H, 4 * H),
                           jnp.float32),
                self.param("lstm{}_b".format(i + 1),
                           nn.initializers.zeros, (4 * H,), jnp.float32)))

        out_w = self.param("out_w", init, (H + E, V), jnp.float32) \
            if not self.weight_tied else None
        out_b = self.param("out_b", nn.initializers.zeros, (V,),
                           jnp.float32)
        proj_w = self.param("tied_proj", init, (H + E, D), jnp.float32) \
            if self.weight_tied else None

        gnmt = self.attention_type in ("gnmt", "gnmt_v2")

        def logits_of(h_top, ctx):
            feat = jnp.concatenate([h_top, ctx], axis=-1)
            if self.weight_tied:
                return (feat @ proj_w) @ embedding.T + out_b
            return feat @ out_w + out_b

        def cell_step(states, ctx_prev, token_emb, memory_, keys_,
                      mem_mask_):
            new_states = []
            x = jnp.concatenate([token_emb, ctx_prev], axis=-1)
            state0, h0 = self._lstm_cell(lstm_params[0], states[0], x)
            new_states.append(state0)
            if gnmt:
                ctx, _ = self._attend(att, h0, keys_, memory_, mem_mask_)
            h = h0
            for i in range(1, self.decoder_layers):
                if self.attention_type == "gnmt_v2" or \
                        (self.attention_type == "gnmt" and i == 1):
                    inp = jnp.concatenate([h, ctx], axis=-1)
                else:
                    inp = h
                state_i, h_new = self._lstm_cell(lstm_params[i],
                                                 states[i], inp)
                new_states.append(state_i)
                h = h + h_new if (self.use_skip_connections and
                                  h.shape == h_new.shape and i > 0) \
                    else h_new
            if not gnmt:
                ctx, _ = self._attend(att, h, keys_, memory_, mem_mask_)
            return new_states, h, ctx

        init_states = tuple((jnp.zeros((B, H)), jnp.zeros((B, H)))
                            for _ in range(self.decoder_layers))
        init_ctx = jnp.zeros((B, E))

        out: Dict[str, Any] = {"src_length": mem_len}
        targets = input_dict.get("target_tensors")
        if targets is not None and self.mode != "infer":
            y = targets[0]
            dec_in = y[:, :-1]
            embs = jnp.take(embedding, dec_in, axis=0)     # (B,T,D)

            use_ss = train and self.sampling_prob > 0.0
            if use_ss:
                # scheduled sampling (reference `parts/rnns/helper.py`
                # ScheduledEmbeddingTrainingHelper): with prob
                # sampling_prob feed the model's own previous argmax
                # instead of the teacher token
                ss_rng = self.make_rng("dropout")

                def step(carry, e_t):
                    states, ctx, prev_emb, rng = carry
                    rng, sub = jax.random.split(rng)
                    coin = jax.random.bernoulli(
                        sub, self.sampling_prob, (e_t.shape[0], 1))
                    inp = jnp.where(coin, prev_emb, e_t)
                    states, h, ctx = cell_step(list(states), ctx, inp,
                                               memory, keys, mem_mask)
                    logits = logits_of(h, ctx)
                    pred_emb = jnp.take(embedding,
                                        jnp.argmax(logits, -1), axis=0)
                    return (tuple(states), ctx, pred_emb, rng), logits

                init = (init_states, init_ctx, embs[:, 0], ss_rng)
                _, logits = jax.lax.scan(step, init,
                                         jnp.moveaxis(embs, 1, 0))
            else:
                def step(carry, e_t):
                    states, ctx = carry
                    states, h, ctx = cell_step(list(states), ctx, e_t,
                                               memory, keys, mem_mask)
                    return (tuple(states), ctx), logits_of(h, ctx)

                _, logits = jax.lax.scan(step, (init_states, init_ctx),
                                         jnp.moveaxis(embs, 1, 0))
            out["logits"] = jnp.moveaxis(logits, 0, 1)
            out["targets"] = y

        if self.mode != "train":
            out.update(self._decode(B, S, embedding, cell_step,
                                    logits_of, init_states, init_ctx,
                                    memory, keys, mem_mask))
        return out

    # ------------------------------------------------------------------
    def _decode(self, B, S, embedding, cell_step, logits_of,
                init_states, init_ctx, memory, keys, mem_mask):
        max_len = 2 * S + 10
        H = self.cell_units

        init_cache = {
            "h": [s[0] for s in init_states],
            "c": [s[1] for s in init_states],
            "ctx": init_ctx,
        }
        # encoder-side tensors are beam-invariant: beam_search tiles
        # them once and keeps them out of the per-step beam gathers
        static_cache = {
            "memory": memory,
            "keys": keys,
            "mem_mask": mem_mask,
        }

        def symbols_to_logits_fn(ids, pos, cache):
            token_emb = jnp.take(embedding, ids[:, 0], axis=0)
            states = list(zip(cache["h"], cache["c"]))
            states, h, ctx = cell_step(states, cache["ctx"], token_emb,
                                       cache["memory"], cache["keys"],
                                       cache["mem_mask"])
            logits = logits_of(h, ctx)
            new_cache = dict(cache)
            new_cache.update({"h": [s[0] for s in states],
                              "c": [s[1] for s in states], "ctx": ctx})
            return logits, new_cache

        if self.is_initializing():
            symbols_to_logits_fn(jnp.zeros((B, 1), jnp.int32), 0,
                                 {**init_cache, **static_cache})
            zeros = jnp.zeros((B, max_len), jnp.int32)
            return {"outputs": [zeros, jnp.zeros((B,), jnp.int32)]}

        decoded, scores = beam_search(
            symbols_to_logits_fn, init_cache, batch_size=B,
            beam_size=self.beam_width, vocab_size=self.tgt_vocab_size,
            max_decode_length=max_len, eos_id=self.end_symbol,
            alpha=self.length_penalty, bos_id=self.go_symbol,
            static_cache=static_cache)
        top = decoded[:, 0, 1:]
        lengths = sequence_lengths_from_ids(top, self.end_symbol)
        return {"outputs": [top, lengths], "scores": scores[:, 0]}


class RNNDecoderWithAttention(Decoder):
    """Config wrapper (reference `rnn_decoders.py:26-54`); greedy
    inference == beam width 1."""

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "GO_SYMBOL": int,
            "END_SYMBOL": int,
            "tgt_vocab_size": int,
            "tgt_emb_size": int,
            "attention_layer_size": int,
            "attention_type": ["bahdanau", "luong", "gnmt", "gnmt_v2"],
            "core_cell": None,
            "decoder_layers": int,
            "decoder_use_skip_connections": bool,
            "batch_size": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Decoder.get_optional_params(), **{
            "core_cell_params": dict,
            "bahdanau_normalize": bool,
            "luong_scale": bool,
            "decoder_dp_input_keep_prob": float,
            "decoder_dp_output_keep_prob": float,
            "time_major": bool,
            "use_swap_memory": bool,
            "proj_size": int,
            "num_groups": int,
            "PAD_SYMBOL": int,
            "weight_tied": bool,
            "beam_width": int,
            "length_penalty": float,
            "sampling_prob": float,   # scheduled sampling
        })

    _default_beam_width = 1

    def make_module(self):
        p = self._params
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        cc = str(p.get("core_cell", "") or "lstm").lower()
        return RNNAttnDecoderModule(
            tgt_vocab_size=p["tgt_vocab_size"],
            tgt_emb_size=p["tgt_emb_size"],
            attention_layer_size=p["attention_layer_size"],
            attention_type=p["attention_type"],
            decoder_layers=p["decoder_layers"],
            cell_units=p.get("core_cell_params", {}).get(
                "num_units", p["tgt_emb_size"]),
            cell_type="gru" if "gru" in cc else "lstm",
            use_skip_connections=p["decoder_use_skip_connections"],
            go_symbol=p["GO_SYMBOL"],
            end_symbol=p["END_SYMBOL"],
            beam_width=p.get("beam_width", self._default_beam_width),
            length_penalty=p.get("length_penalty", 0.0),
            input_keep_prob=p.get("decoder_dp_input_keep_prob", 1.0),
            output_keep_prob=p.get("decoder_dp_output_keep_prob", 1.0),
            weight_tied=p.get("weight_tied", False),
            sampling_prob=p.get("sampling_prob", 0.0),
            dtype_=dtype,
            mode=self._mode)


class BeamSearchRNNDecoderWithAttention(RNNDecoderWithAttention):
    """Reference `rnn_decoders.py:324-532`."""

    @staticmethod
    def get_optional_params():
        return dict(RNNDecoderWithAttention.get_optional_params(), **{
            "length_penalty": float,
            "beam_width": int,
        })

    _default_beam_width = 4
