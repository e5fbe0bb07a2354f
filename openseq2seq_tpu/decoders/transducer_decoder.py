"""Transducer (RNN-T) decoder: LSTM prediction network + additive joint
network + jitted greedy decode (Graves 2012).

Beyond-parity component — the reference's ASR decoders stop at
CTC/attention (`open_seq2seq/decoders/fc_decoders.py`,
`las_decoder.py`); the transducer is the streaming architecture that
replaced them in production ASR. It rides the existing Speech2Text
stack: any framework encoder (Conformer, TDNN, DS2) feeds it, the WER
eval path consumes its ``outputs = [ids, lengths]`` contract unchanged
(`models/speech2text.py`), and :class:`..losses.TransducerLoss` trains
it.

TPU-first design:

  * Training computes the full (B, T, U+1, V) joint lattice in one shot
    — two projection matmuls plus a broadcast add — so the whole loss
    input is MXU work with static shapes; the memory hog (the tanh
    pre-activation) is fused by XLA into the output projection.
  * All parameters are raw arrays created unconditionally at the top of
    ``__call__`` (identical trees across train/eval/infer modes) and
    captured by pure closures, so the same weights serve the training
    lattice, the scan prediction network, and the ``lax.scan`` greedy
    decode without linen-transform gymnastics.
  * Greedy decode is one ``lax.scan`` over frames with the
    symbols-per-frame loop unrolled (``max_symbols_per_frame``, default
    3): each iteration is a (B, J)·(J, V) matmul + masked state update,
    no data-dependent shapes. Emission writes use a one-hot select at
    the per-example output cursor (no scatters).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import Decoder
from ..parts.dropout import Dropout


class TransducerDecoderModule(nn.Module):
    tgt_vocab_size: int          # V including blank (= last id, V-1)
    pred_embed_size: int
    pred_units: int
    pred_layers: int
    joint_dim: int
    max_symbols_per_frame: int
    max_output_length: int       # 0 -> number of encoder frames
    dropout: float               # prediction-net dropout (train only)
    fused_loss: bool             # hand activations (not logits) to the
                                 # diagonal-fused transducer loss
    beam_width: int              # 1 -> greedy; >1 -> frame-sync beam
    dtype_: Any
    mode: str
    # shallow fusion (beam only): static spec tuple
    # (arpa_path, labels_tuple, weight, beta, order) or None. The ARPA
    # LM is densified once into an on-device table
    # (`ops/ngram_fusion.py`) — each hypothesis's LM state is one int32
    # rolling context index, advanced in lockstep with the beam.
    lm_fusion: Any = None

    @nn.compact
    def __call__(self, input_dict: Dict[str, Any], train: bool):
        enc = input_dict["encoder_output"]["outputs"]
        enc_len = input_dict["encoder_output"]["src_length"]
        V, E, H = self.tgt_vocab_size, self.pred_embed_size, self.pred_units
        J, dt = self.joint_dim, self.dtype_
        blank = V - 1

        # ---- parameters (created unconditionally: identical tree in
        # every mode, so train checkpoints restore into eval/infer) ----
        embedding = self.param(
            "pred_embedding",
            nn.initializers.normal(1.0 / np.sqrt(E)), (V, E), jnp.float32)
        cells = []
        for layer in range(self.pred_layers):
            in_dim = E if layer == 0 else H
            cells.append((
                self.param("pred_wx%d" % layer,
                           nn.initializers.xavier_uniform(),
                           (in_dim, 4 * H), jnp.float32).astype(dt),
                self.param("pred_wh%d" % layer,
                           nn.initializers.xavier_uniform(),
                           (H, 4 * H), jnp.float32).astype(dt),
                self.param("pred_b%d" % layer, nn.initializers.zeros,
                           (4 * H,), jnp.float32).astype(dt)))
        joint_enc_w = self.param(
            "joint_enc_w", nn.initializers.xavier_uniform(),
            (enc.shape[-1], J), jnp.float32).astype(dt)
        joint_pred_w = self.param(
            "joint_pred_w", nn.initializers.xavier_uniform(), (H, J),
            jnp.float32).astype(dt)
        joint_b = self.param(
            "joint_b", nn.initializers.zeros, (J,), jnp.float32).astype(dt)
        joint_out_w = self.param(
            "joint_out_w", nn.initializers.xavier_uniform(), (J, V),
            jnp.float32).astype(dt)
        joint_out_b = self.param(
            "joint_out_b", nn.initializers.zeros, (V,),
            jnp.float32).astype(dt)
        emb = embedding.astype(dt)

        # ---- pure helpers -------------------------------------------
        def cell_step(layer, state, x):
            # LSTM step, forget bias +1 (framework convention —
            # `decoders/rnn_decoders.py:_lstm_cell`)
            wx, wh, b = cells[layer]
            h_prev, c_prev = state
            gates = x @ wx + h_prev @ wh + b
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f + 1.0) * c_prev + \
                jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        def init_states(B):
            return tuple((jnp.zeros((B, H), dt), jnp.zeros((B, H), dt))
                         for _ in range(self.pred_layers))

        def pred_step(states, tokens):
            x = emb[tokens]
            new_states = []
            for layer in range(self.pred_layers):
                st, x = cell_step(layer, states[layer], x)
                new_states.append(st)
            return tuple(new_states), x

        def joint_logits(enc_j, pred_j):
            h = jnp.tanh(enc_j + pred_j + joint_b)
            return (h @ joint_out_w + joint_out_b).astype(jnp.float32)

        out: Dict[str, Any] = {"src_length": enc_len}

        # ---- training/eval lattice ----------------------------------
        targets = input_dict.get("target_tensors")
        if targets is not None:
            labels, _ = targets[:2]
            B = labels.shape[0]
            tokens = jnp.concatenate(
                [jnp.full((B, 1), blank, jnp.int32),
                 labels.astype(jnp.int32)], axis=1)             # (B,U1)
            x = emb[tokens]                                     # (B,U1,E)
            for layer in range(self.pred_layers):
                init = (jnp.zeros((B, H), dt), jnp.zeros((B, H), dt))

                def step(carry, xt, _l=layer):
                    return cell_step(_l, carry, xt)

                _, hs = jax.lax.scan(step, init, jnp.moveaxis(x, 1, 0))
                x = jnp.moveaxis(hs, 0, 1)                      # (B,U1,H)
                x = Dropout(rate=self.dropout,
                            deterministic=not train)(x)
            enc_j = enc.astype(dt) @ joint_enc_w                # (B,T,J)
            pred_j = x @ joint_pred_w                           # (B,U1,J)
            if self.fused_loss:
                # the diagonal-fused loss (`ops/transducer.py:
                # transducer_loss_fused`) evaluates the joint inside its
                # wavefront scan — never materialize (B,T,U+1,V) here
                out["joint_fused"] = {
                    "enc_j": enc_j, "pred_j": pred_j,
                    "joint_b": joint_b, "out_w": joint_out_w,
                    "out_b": joint_out_b}
            else:
                out["logits"] = joint_logits(
                    enc_j[:, :, None, :],
                    pred_j[:, None, :, :])                      # (B,T,U1,V)

        # ---- beam decode (expansion-limited TSD) --------------------
        if not train and self.beam_width > 1:
            best, nbest = self._beam_decode(
                enc, enc_len, init_states, pred_step, joint_logits,
                joint_enc_w, joint_pred_w, blank)
            out["outputs"] = best
            # full beam for host-side n-best rescoring
            # (apps/lm_rescorer.py): [ids (B,K,Lmax), lens (B,K),
            # scores (B,K)], score-sorted descending per utterance
            out["nbest"] = nbest
        # ---- greedy decode ------------------------------------------
        elif not train:
            B, T, _ = enc.shape
            Lmax = self.max_output_length or T
            enc_j = enc.astype(dt) @ joint_enc_w                # (B,T,J)
            # streaming support: a caller may hand in the prediction-net
            # carry from a previous chunk ("decode_carry") and restrict
            # which encoder frames this call consumes ("decode_window",
            # a (lo, hi) pair of (B,) frame indices). Tokens for the
            # window are emitted exactly once and the final carry is
            # returned, so consecutive chunked calls compose to the
            # full-utterance greedy decode (apps/frame_asr.py:
            # TransducerFrameASR).
            carry_in = input_dict.get("decode_carry")
            if carry_in is not None:
                states, pred_j = carry_in
                states = jax.tree_util.tree_map(
                    lambda x: x.astype(dt), states)
                pred_j = pred_j.astype(dt)
            else:
                states, h = pred_step(init_states(B),
                                      jnp.full((B,), blank, jnp.int32))
                pred_j = h @ joint_pred_w                       # (B,J)
            window = input_dict.get("decode_window")
            if window is not None:
                t_lo = jnp.asarray(window[0], jnp.int32)
                t_hi = jnp.minimum(jnp.asarray(window[1], jnp.int32),
                                   enc_len)
            else:
                t_lo = jnp.zeros_like(enc_len)
                t_hi = enc_len
            out_ids = jnp.full((B, Lmax), -1, jnp.int32)
            out_frames = jnp.full((B, Lmax), -1, jnp.int32)
            out_len = jnp.zeros((B,), jnp.int32)
            slot = jnp.arange(Lmax)[None, :]

            def frame(carry, xt):
                states, pred_j, out_ids, out_frames, out_len = carry
                enc_jt, t = xt
                active = (t >= t_lo) & (t < t_hi)               # (B,)
                for _ in range(self.max_symbols_per_frame):
                    logits = joint_logits(enc_jt, pred_j)       # (B,V)
                    k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    emit = active & (k != blank) & (out_len < Lmax)
                    write = (slot == out_len[:, None]) & emit[:, None]
                    out_ids = jnp.where(write, k[:, None], out_ids)
                    out_frames = jnp.where(write, t, out_frames)
                    out_len = out_len + emit.astype(jnp.int32)
                    new_states, h = pred_step(states, k)
                    states = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(emit[:, None], n, o),
                        new_states, states)
                    pred_j = jnp.where(emit[:, None],
                                       h @ joint_pred_w, pred_j)
                    active = emit
                return (states, pred_j, out_ids, out_frames,
                        out_len), None

            xs = (jnp.moveaxis(enc_j, 1, 0), jnp.arange(T))
            (states, pred_j, out_ids, out_frames, out_len), _ = \
                jax.lax.scan(
                    frame,
                    (states, pred_j, out_ids, out_frames, out_len), xs)
            out["outputs"] = [out_ids, out_len]
            # per-emission encoder-frame indices (RNN-T emits frame-
            # synchronously, so these ARE the label timestamps)
            out["emit_frames"] = out_frames
            out["decode_carry"] = (states, pred_j)
        return out

    def _beam_decode(self, enc, enc_len, init_states, pred_step,
                     joint_logits, joint_enc_w, joint_pred_w, blank):
        """Frame-synchronous, expansion-limited transducer beam search
        (time-synchronous decoding with ``max_symbols_per_frame``
        expansion rounds per frame — the static-shape TPU analogue of
        Graves 2012 beam search; compare the reference's batched CTC
        beam, `decoders/ctc_beam_search_decoder.cpp`, which is likewise
        breadth-first over frames).

        Everything is fixed-shape: the beam lives as (B, K) score /
        length / done lanes plus (B*K,)-row prediction-net states, each
        frame is one step of an outer ``lax.scan``, and each expansion
        round selects ``top_k`` over the (B, K*V) candidate matrix —
        K*(V-1) label extensions plus each hypothesis's stay-put blank
        candidate. A hypothesis that takes blank is "done" for the
        frame and competes unchanged in later rounds; after
        ``max_symbols_per_frame`` label rounds a final round forces
        blank, so every survivor consumes the frame exactly once (its
        per-frame blank log-prob is added exactly once) and the label
        budget per frame matches greedy decode's.
        Hypotheses are not merged (standard for production RNN-T
        decoders; merging needs dynamic prefix comparison).

        Returns ``[ids (B, Lmax), lengths (B,)]`` for the best-scoring
        hypothesis — same contract as greedy decode.
        """
        V, K, J = self.tgt_vocab_size, self.beam_width, self.joint_dim
        msf = self.max_symbols_per_frame
        B, T, _ = enc.shape
        Lmax = self.max_output_length or T
        dt = self.dtype_
        NEG = jnp.float32(-1e30)

        fusion = None
        if self.lm_fusion is not None:
            from ..ops.ngram_fusion import dense_label_lm
            arpa, labels_t, w_lm, lm_beta, lm_order = self.lm_fusion
            tab_np, C, m, ctx0 = dense_label_lm(arpa, labels_t, lm_order)
            assert len(labels_t) == V - 1, \
                "fusion LM labels must be the V-1 non-blank outputs"
            # pad a zero blank column so the table broadcasts over the
            # (B, K, V) candidate matrix; blank expansions pay no LM
            tab = jnp.pad(jnp.asarray(tab_np) * w_lm, ((0, 0), (0, 1)))
            bonus = jnp.where(jnp.arange(V) == blank, 0.0,
                              jnp.float32(lm_beta))
            fusion = (tab + bonus, C, m, ctx0)

        enc_j = enc.astype(dt) @ joint_enc_w                    # (B,T,J)
        states0, h = pred_step(
            init_states(B * K), jnp.full((B * K,), blank, jnp.int32))
        pred_j0 = (h @ joint_pred_w).reshape(B, K, J)
        # only lane 0 is live at t=0 — all lanes share the empty prefix,
        # so without this the beam would fill with K copies of it
        scores0 = jnp.full((B, K), NEG).at[:, 0].set(0.0)
        ids0 = jnp.full((B, K, Lmax), -1, jnp.int32)
        len0 = jnp.zeros((B, K), jnp.int32)
        slot = jnp.arange(Lmax)[None, None, :]
        not_blank = (jnp.arange(V) != blank)[None, None, :]     # (1,1,V)

        def gather_k(x, parent):
            """take_along_axis on the beam axis of a (B,K,...) array."""
            idx = parent.reshape(parent.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, idx, axis=1)

        def frame(carry, xt):
            states, pred_j, scores, out_ids, out_len, lm_ctx = carry
            enc_jt, t = xt                                      # (B,J)
            active = t < enc_len                                # (B,)
            # inactive frames (past this utterance's length) carry the
            # whole beam through unchanged
            done = jnp.broadcast_to(~active[:, None], (B, K))
            for s in range(msf + 1):
                logits = joint_logits(enc_jt[:, None, :], pred_j)
                logp = jax.nn.log_softmax(logits, axis=-1)      # (B,K,V)
                cand = scores[:, :, None] + logp
                if fusion is not None:
                    # weighted LM log-probs (+ label bonus) for every
                    # label expansion; the blank column is zero and is
                    # overwritten by the stay-put expression below
                    cand = cand + fusion[0][lm_ctx]
                # stay-put candidate in the blank slot: done lanes carry
                # their score (this frame's blank already paid)
                cand = jnp.where(
                    not_blank, cand,
                    jnp.where(done, scores, scores +
                              logp[..., blank])[:, :, None])
                label_ok = (~done & (out_len < Lmax))[:, :, None]
                if s == msf:  # force blank: frame label budget exhausted
                    label_ok = jnp.zeros_like(label_ok)
                cand = jnp.where(not_blank & ~label_ok, NEG, cand)
                scores, top_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
                parent = top_idx // V                           # (B,K)
                tok = (top_idx % V).astype(jnp.int32)
                is_label = tok != blank
                # reorder every beam lane to its parent
                out_ids = gather_k(out_ids, parent)
                out_len = gather_k(out_len, parent)
                pred_j = gather_k(pred_j, parent)
                done = gather_k(done, parent)
                lm_ctx = gather_k(lm_ctx, parent)
                if fusion is not None:
                    _, C, m, _ = fusion
                    lm_ctx = jnp.where(
                        is_label,
                        lm_ctx // C + tok * (C ** (m - 1)), lm_ctx)
                flat_parent = (parent +
                               jnp.arange(B)[:, None] * K).reshape(-1)
                states = jax.tree_util.tree_map(
                    lambda x: x[flat_parent], states)
                # label lanes: append token, advance the prediction net
                write = (slot == out_len[:, :, None]) & \
                    is_label[:, :, None]
                out_ids = jnp.where(write, tok[:, :, None], out_ids)
                out_len = out_len + is_label.astype(jnp.int32)
                new_states, h = pred_step(states, tok.reshape(-1))
                keep = is_label.reshape(-1, 1)
                states = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(keep, n, o), new_states,
                    states)
                pred_j = jnp.where(
                    is_label[:, :, None],
                    (h @ joint_pred_w).reshape(B, K, J), pred_j)
                done = ~is_label
            return (states, pred_j, scores, out_ids, out_len,
                    lm_ctx), None

        lm_ctx0 = jnp.full((B, K), fusion[3] if fusion is not None
                           else 0, jnp.int32)
        xs = (jnp.moveaxis(enc_j, 1, 0), jnp.arange(T))
        (_, _, scores, out_ids, out_len, _), _ = jax.lax.scan(
            frame, (states0, pred_j0, scores0, ids0, len0, lm_ctx0), xs)
        # sort lanes by final score (top_k keeps rounds sorted, but the
        # last round's stay-put blanks can reorder ties) so nbest[:, 0]
        # is the 1-best and rescorers can truncate cheaply
        order = jnp.argsort(-scores, axis=1)                    # (B,K)
        scores = jnp.take_along_axis(scores, order, axis=1)
        out_len = jnp.take_along_axis(out_len, order, axis=1)
        out_ids = jnp.take_along_axis(out_ids, order[:, :, None], axis=1)
        return ([out_ids[:, 0], out_len[:, 0]],
                [out_ids, out_len, scores])


class TransducerDecoder(Decoder):
    """Config wrapper (schema style mirrors the other decoders)."""

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "tgt_vocab_size": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Decoder.get_optional_params(), **{
            "pred_embed_size": int,       # prediction-net embedding dim
            "pred_units": int,            # prediction-net LSTM width
            "pred_layers": int,           # prediction-net LSTM depth
            "joint_dim": int,             # joint-network hidden width
            "max_symbols_per_frame": int,  # greedy decode emit cap/frame
            "max_output_length": int,     # decode buffer (0 -> frames)
            "dropout_keep_prob": float,
            "fused_loss": bool,           # diagonal-fused loss: no
                                          # (B,T,U+1,V) lattice in HBM
            "beam_width": int,            # >1: frame-sync beam decode
            # --- shallow fusion (beam decode only) -------------------
            "lm_fusion_arpa": str,        # label-level ARPA/binary LM;
                                          # densified on-device
                                          # (ops/ngram_fusion.py)
            "lm_fusion_weight": float,    # lambda on LM log-probs (0.5)
            "lm_fusion_beta": float,      # per-label insertion bonus
            "lm_fusion_order": int,       # densification order cap (3)
            "alphabet_config_path": str,  # id-ordered label chars (same
                                          # file the data layer uses)
        })

    def make_module(self):
        p = self._params
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        lm_fusion = None
        if p.get("lm_fusion_arpa"):
            from ..data.speech2text.speech2text import (
                load_pre_existing_vocabulary)
            vocab = load_pre_existing_vocabulary(
                p["alphabet_config_path"], read_chars=True)
            labels = tuple(c for c, _ in
                           sorted(vocab.items(), key=lambda kv: kv[1]))
            lm_fusion = (p["lm_fusion_arpa"], labels,
                         float(p.get("lm_fusion_weight", 0.5)),
                         float(p.get("lm_fusion_beta", 0.0)),
                         int(p.get("lm_fusion_order", 3)))
        return TransducerDecoderModule(
            tgt_vocab_size=p["tgt_vocab_size"],
            pred_embed_size=p.get("pred_embed_size", 320),
            pred_units=p.get("pred_units", 320),
            pred_layers=p.get("pred_layers", 1),
            joint_dim=p.get("joint_dim", 320),
            max_symbols_per_frame=p.get("max_symbols_per_frame", 3),
            max_output_length=p.get("max_output_length", 0),
            dropout=1.0 - p.get("dropout_keep_prob", 1.0),
            fused_loss=p.get("fused_loss", False),
            beam_width=p.get("beam_width", 1),
            dtype_=dtype,
            mode=self._mode,
            lm_fusion=lm_fusion,
        )
