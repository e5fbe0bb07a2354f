"""Listen-Attend-Spell decoder (reference
`open_seq2seq/decoders/las_decoder.py:22-399`).

A character-level attention speller, distinct from the NMT RNN decoder
(`rnn_decoders.py`): the reference schema drives it —
``attention_params`` selects bahdanau or location-sensitive
("chorowski"/"zhaopeng", Chorowski conv features over the previous
alignments, optional coverage accumulation,
`parts/rnns/attention_wrapper.py:LocationSensitiveAttention`),
``num_heads`` independent attention heads each with its own
``hidden_dim`` attention layer (AttentionWrapper ``attention_layer_size``
semantics), optional learned positional embeddings added to BOTH the
encoder memory and the decoder inputs, and a dropout-preceded
fully-connected vocab projection.

Teacher-forced training and greedy/beam decode are single ``lax.scan``/
``while_loop`` programs like the other recurrent decoders here.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import Decoder
from ..ops.beam_search import beam_search, sequence_lengths_from_ids

_NEG = -1e9
_MAX_POS = 1024          # reference positional table size
_LOC_FILTERS = 10        # reference location_attention_params
_LOC_KERNEL = 101


class LASDecoderModule(nn.Module):
    tgt_vocab_size: int
    tgt_emb_size: int
    attention_dim: int
    attention_type: str          # bahdanau|chorowski|zhaopeng
    num_heads: int
    use_coverage: bool
    plot_attention: bool
    hidden_dim: int
    num_layers: int
    rnn_type: str                # lstm|gru
    pos_embedding: bool
    dropout_keep_prob: float
    go_symbol: int
    end_symbol: int
    beam_width: int
    mode: str

    # ------------------------------------------------------------------
    def _cell(self, params, state, x):
        if self.rnn_type == "gru":
            wx, wh, b = params
            h_prev = state[0]
            zr = x @ wx[:, :2 * self.hidden_dim] + \
                h_prev @ wh[:, :2 * self.hidden_dim] + \
                b[:2 * self.hidden_dim]
            z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
            hh = jnp.tanh(x @ wx[:, 2 * self.hidden_dim:] +
                          (r * h_prev) @ wh[:, 2 * self.hidden_dim:] +
                          b[2 * self.hidden_dim:])
            h = (1 - z) * h_prev + z * hh
            return (h,), h
        wx, wh, b = params
        h_prev, c_prev = state
        gates = x @ wx + h_prev @ wh + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c_prev + \
            jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    @property
    def _location(self) -> bool:
        return self.attention_type in ("chorowski", "zhaopeng")

    @nn.compact
    def __call__(self, input_dict: Dict[str, Any], train: bool):
        enc = input_dict["encoder_output"]
        memory = enc["outputs"].astype(jnp.float32)
        mem_len = enc["src_length"]
        B, S, E = memory.shape
        H = self.hidden_dim
        V = self.tgt_vocab_size
        D = self.tgt_emb_size
        A = self.attention_dim
        NH = self.num_heads
        mem_mask = jnp.arange(S)[None, :] < mem_len[:, None]
        init = nn.initializers.xavier_uniform()
        keep = self.dropout_keep_prob if train else 1.0

        embedding = self.param("TargetEmbeddingMatrix",
                               nn.initializers.normal(D ** -0.5),
                               (V, D), jnp.float32)
        if self.pos_embedding:
            enc_pos = self.param("EncoderPositionEmbeddingMatrix",
                                 nn.initializers.normal(0.02),
                                 (_MAX_POS, E), jnp.float32)
            dec_pos = self.param("DecoderPositionEmbeddingMatrix",
                                 nn.initializers.normal(0.02),
                                 (_MAX_POS, D), jnp.float32)
            pe = enc_pos[:min(S, _MAX_POS)]
            if S > _MAX_POS:      # long memories: positions past the
                pe = jnp.pad(pe, ((0, S - _MAX_POS), (0, 0)))  # table
            memory = memory + pe[None, :, :]                   # get none

        # per-head attention params: projected keys + query/score vecs,
        # location conv filters, and the head's attention output layer.
        # Keys are stacked (B, NH, S, A) — batch-leading so the beam
        # search can tile/gather them through its cache.
        heads = []
        head_keys = []
        for i in range(NH):
            head_keys.append(nn.Dense(A, dtype=jnp.float32,
                                      param_dtype=jnp.float32,
                                      name="att{}_keys".format(i))(memory))
            head = {
                "q": self.param("att{}_q".format(i), init, (H, A),
                                jnp.float32),
                "v": self.param("att{}_v".format(i),
                                nn.initializers.normal(0.1), (A,),
                                jnp.float32),
                "b": self.param("att{}_b".format(i),
                                nn.initializers.zeros, (A,), jnp.float32),
                "out_w": self.param("att{}_out_w".format(i), init,
                                    (H + E, H), jnp.float32),
                "out_b": self.param("att{}_out_b".format(i),
                                    nn.initializers.zeros, (H,),
                                    jnp.float32),
            }
            if self._location:
                head["loc_conv"] = self.param(
                    "att{}_loc_conv".format(i), init,
                    (_LOC_KERNEL, 1, _LOC_FILTERS), jnp.float32)
                head["loc_proj"] = self.param(
                    "att{}_loc_proj".format(i), init,
                    (_LOC_FILTERS, A), jnp.float32)
            heads.append(head)
        keys_all = jnp.stack(head_keys, axis=1)            # (B,NH,S,A)

        def attend(h_top, aligns_prev, memory_, keys_, mem_mask_):
            """Per-head attention; returns (attention vec (B, NH*H),
            aligns (B, NH, S)). memory_/keys_/mem_mask_ are passed
            explicitly (the beam search tiles them through its cache)."""
            outs, aligns = [], []
            for i, head in enumerate(heads):
                q = (h_top @ head["q"])[:, None, :]        # (B,1,A)
                e = q + keys_[:, i] + head["b"]
                if self._location:
                    loc_in = aligns_prev[:, i, :, None]    # (B,S,1)
                    f = jax.lax.conv_general_dilated(
                        loc_in, head["loc_conv"],
                        window_strides=(1,), padding="SAME",
                        dimension_numbers=("NWC", "WIO", "NWC"))
                    e = e + f @ head["loc_proj"]
                scores = jnp.einsum("bsa,a->bs", jnp.tanh(e), head["v"])
                scores = jnp.where(mem_mask_, scores, _NEG)
                align = jax.nn.softmax(scores, axis=-1)
                ctx = jnp.einsum("bs,bse->be", align, memory_)
                att = jnp.concatenate([h_top, ctx], -1) @ head["out_w"] \
                    + head["out_b"]
                outs.append(att)
                aligns.append(align)
            return (jnp.concatenate(outs, axis=-1),
                    jnp.stack(aligns, axis=1))

        cell_params = []
        gates = 3 if self.rnn_type == "gru" else 4
        for i in range(self.num_layers):
            d_in = (D + NH * H) if i == 0 else H
            cell_params.append((
                self.param("rnn{}_wx".format(i + 1), init,
                           (d_in, gates * H), jnp.float32),
                self.param("rnn{}_wh".format(i + 1),
                           nn.initializers.orthogonal(),
                           (H, gates * H), jnp.float32),
                self.param("rnn{}_b".format(i + 1),
                           nn.initializers.zeros, (gates * H,),
                           jnp.float32)))

        proj_w = self.param("fully_connected_w", init, (NH * H, V),
                            jnp.float32)
        proj_b = self.param("fully_connected_b", nn.initializers.zeros,
                            (V,), jnp.float32)

        def cell_step(states, att_prev, aligns_state, token_emb,
                      memory_, keys_, mem_mask_, dropout_rng=None):
            """One speller step. aligns_state: (B, NH, S) — previous
            alignment, or the coverage accumulator when use_coverage."""
            x = jnp.concatenate([token_emb, att_prev], axis=-1)
            new_states = []
            h = x
            for i in range(self.num_layers):
                state_i, h = self._cell(cell_params[i], states[i], h)
                if dropout_rng is not None and keep < 1.0:
                    dr = jax.random.fold_in(dropout_rng, i)
                    mask = jax.random.bernoulli(dr, keep, h.shape)
                    h = jnp.where(mask, h / keep, 0.0)
                new_states.append(state_i)
            att, aligns = attend(h, aligns_state, memory_, keys_,
                                 mem_mask_)
            new_aligns = aligns_state + aligns if self.use_coverage \
                else aligns
            return new_states, att, aligns, new_aligns

        def logits_of(att, dropout_rng=None):
            feat = att
            if dropout_rng is not None and keep < 1.0:
                mask = jax.random.bernoulli(dropout_rng, keep, feat.shape)
                feat = jnp.where(mask, feat / keep, 0.0)
            return feat @ proj_w + proj_b

        zero_state = ((jnp.zeros((B, H)),) if self.rnn_type == "gru"
                      else (jnp.zeros((B, H)), jnp.zeros((B, H))))
        init_states = tuple(zero_state for _ in range(self.num_layers))
        init_att = jnp.zeros((B, NH * H))
        init_aligns = jnp.zeros((B, NH, S))

        out: Dict[str, Any] = {"src_length": mem_len}
        targets = input_dict.get("target_tensors")
        if targets is not None and self.mode != "infer":
            y = targets[0]
            dec_in = y[:, :-1]
            embs = jnp.take(embedding, dec_in, axis=0)     # (B,T,D)
            if self.pos_embedding:
                T = embs.shape[1]
                pe = dec_pos[:min(T, _MAX_POS)]
                if T > _MAX_POS:
                    pe = jnp.pad(pe, ((0, T - _MAX_POS), (0, 0)))
                embs = embs + pe[None, :, :]
            drop_rng = self.make_rng("dropout") if (train and keep < 1.0) \
                else None

            def step(carry, inp):
                states, att, aligns_state = carry
                e_t, t = inp
                rng_t = (jax.random.fold_in(drop_rng, t)
                         if drop_rng is not None else None)
                states, att, aligns, aligns_state = cell_step(
                    list(states), att, aligns_state, e_t,
                    memory, keys_all, mem_mask, rng_t)
                logits = logits_of(
                    att, jax.random.fold_in(rng_t, 999)
                    if rng_t is not None else None)
                return (tuple(states), att, aligns_state), (logits, aligns)

            T = embs.shape[1]
            (_, _, _), (logits, aligns_hist) = jax.lax.scan(
                step, (init_states, init_att, init_aligns),
                (jnp.moveaxis(embs, 1, 0), jnp.arange(T)))
            out["logits"] = jnp.moveaxis(logits, 0, 1)
            out["targets"] = y
            if self.plot_attention:
                # (T, B, NH, S) -> (B, T, S), head 0
                out["alignments"] = jnp.moveaxis(aligns_hist[:, :, 0, :],
                                                 0, 1)

        if self.mode != "train":
            out.update(self._decode(B, S, embedding, dec_pos
                                    if self.pos_embedding else None,
                                    cell_step, logits_of, init_states,
                                    init_att, init_aligns, memory,
                                    keys_all, mem_mask))
        return out

    # ------------------------------------------------------------------
    def _decode(self, B, S, embedding, dec_pos, cell_step, logits_of,
                init_states, init_att, init_aligns, memory, keys_all,
                mem_mask):
        max_len = min(S + 10, _MAX_POS)

        init_cache = {
            "states": [list(s) for s in init_states],
            "att": init_att,
            "aligns": init_aligns,
        }
        # encoder-side tensors are beam-INVARIANT: tile them once to
        # the beam-flattened batch (B*K, ...) and close over them —
        # carrying them in the cache would re-gather the full (S, E)
        # memory every decode step for no value change
        K = max(self.beam_width, 1)
        memory_t = jnp.repeat(memory, K, axis=0)
        keys_t = jnp.repeat(keys_all, K, axis=0)
        mem_mask_t = jnp.repeat(mem_mask, K, axis=0)

        def symbols_to_logits_fn(ids, pos, cache):
            token_emb = jnp.take(embedding, ids[:, 0], axis=0)
            if dec_pos is not None:
                token_emb = token_emb + jax.lax.dynamic_slice_in_dim(
                    dec_pos, jnp.minimum(pos, _MAX_POS - 1), 1, 0)
            states = [tuple(s) for s in cache["states"]]
            states, att, _, aligns_state = cell_step(
                states, cache["att"], cache["aligns"], token_emb,
                memory_t, keys_t, mem_mask_t)
            logits = logits_of(att)
            new_cache = dict(cache)
            new_cache.update({"states": [list(s) for s in states],
                              "att": att, "aligns": aligns_state})
            return logits, new_cache

        if self.is_initializing():
            # every decoder param is created eagerly in __call__ before
            # _decode, so init needs no trace of the decode loop (whose
            # closures are already beam-tiled to B*K)
            zeros = jnp.zeros((B, max_len), jnp.int32)
            return {"outputs": [zeros, jnp.zeros((B,), jnp.int32)]}

        decoded, scores = beam_search(
            symbols_to_logits_fn, init_cache, batch_size=B,
            beam_size=max(self.beam_width, 1),
            vocab_size=self.tgt_vocab_size,
            max_decode_length=max_len, eos_id=self.end_symbol,
            alpha=0.0, bos_id=self.go_symbol)
        top = decoded[:, 0, 1:]
        lengths = sequence_lengths_from_ids(top, self.end_symbol)
        return {"outputs": [top, lengths], "scores": scores[:, 0],
                "tgt_length": lengths}


class ListenAttendSpellDecoder(Decoder):
    """Reference-schema config wrapper
    (`open_seq2seq/decoders/las_decoder.py:77-98`)."""

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "GO_SYMBOL": int,
            "END_SYMBOL": int,
            "tgt_vocab_size": int,
            "tgt_emb_size": int,
            "attention_params": dict,
            "rnn_type": None,
            "hidden_dim": int,
            "num_layers": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Decoder.get_optional_params(), **{
            "dropout_keep_prob": float,
            "pos_embedding": bool,
            "beam_width": int,
            "use_language_model": bool,
        })

    def make_module(self):
        p = self._params
        ap = p["attention_params"]
        att_type = ap.get("attention_type", "bahdanau")
        if att_type == "bahadanu":     # reference spelling
            att_type = "bahdanau"
        return LASDecoderModule(
            tgt_vocab_size=p["tgt_vocab_size"],
            tgt_emb_size=p["tgt_emb_size"],
            attention_dim=ap.get("attention_dim", p["hidden_dim"]),
            attention_type=att_type,
            num_heads=ap.get("num_heads", 1),
            use_coverage=ap.get("use_coverage", False),
            plot_attention=ap.get("plot_attention", False),
            hidden_dim=p["hidden_dim"],
            num_layers=p["num_layers"],
            rnn_type=p.get("rnn_type", "lstm") or "lstm",
            pos_embedding=p.get("pos_embedding", False),
            dropout_keep_prob=p.get("dropout_keep_prob", 1.0),
            go_symbol=p["GO_SYMBOL"],
            end_symbol=p["END_SYMBOL"],
            beam_width=p.get("beam_width", 1),
            mode=self._mode,
        )
