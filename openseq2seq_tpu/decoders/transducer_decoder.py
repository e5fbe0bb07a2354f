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
    dtype_: Any
    mode: str

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

        # ---- greedy decode ------------------------------------------
        if not train:
            B, T, _ = enc.shape
            Lmax = self.max_output_length or T
            enc_j = enc.astype(dt) @ joint_enc_w                # (B,T,J)
            states, h = pred_step(init_states(B),
                                  jnp.full((B,), blank, jnp.int32))
            pred_j = h @ joint_pred_w                           # (B,J)
            out_ids = jnp.full((B, Lmax), -1, jnp.int32)
            out_len = jnp.zeros((B,), jnp.int32)
            slot = jnp.arange(Lmax)[None, :]

            def frame(carry, xt):
                states, pred_j, out_ids, out_len = carry
                enc_jt, t = xt
                active = t < enc_len                            # (B,)
                for _ in range(self.max_symbols_per_frame):
                    logits = joint_logits(enc_jt, pred_j)       # (B,V)
                    k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    emit = active & (k != blank) & (out_len < Lmax)
                    write = (slot == out_len[:, None]) & emit[:, None]
                    out_ids = jnp.where(write, k[:, None], out_ids)
                    out_len = out_len + emit.astype(jnp.int32)
                    new_states, h = pred_step(states, k)
                    states = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(emit[:, None], n, o),
                        new_states, states)
                    pred_j = jnp.where(emit[:, None],
                                       h @ joint_pred_w, pred_j)
                    active = emit
                return (states, pred_j, out_ids, out_len), None

            xs = (jnp.moveaxis(enc_j, 1, 0), jnp.arange(T))
            (_, _, out_ids, out_len), _ = jax.lax.scan(
                frame, (states, pred_j, out_ids, out_len), xs)
            out["outputs"] = [out_ids, out_len]
        return out


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
        })

    def make_module(self):
        p = self._params
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
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
            dtype_=dtype,
            mode=self._mode,
        )
