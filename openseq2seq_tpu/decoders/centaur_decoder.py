"""Centaur decoder (reference
`open_seq2seq/decoders/centaur_decoder.py:13-588` + `parts/centaur/*`):
a fully-convolutional/attention autoregressive TTS decoder — prenet,
N blocks of [causal conv, multi-head cross-attention over the encoder],
frame + stop-token projections, conv postnet.

Unlike Tacotron there is no recurrence, so the teacher-forced pass is
one parallel causal program (great MXU shape); inference re-runs the
causal stack over the growing frame buffer inside a ``fori_loop``
(O(T^2), same asymptotics as the reference's loop).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp

from .decoder import Decoder
from ..parts.transformer.common import get_position_encoding

_NEG = -1e9


class CentaurDecoderModule(nn.Module):
    num_audio_features: int
    prenet_layers: int
    prenet_hidden_size: int
    hidden_size: int
    conv_layers: tuple
    attention_heads: int
    attention_dropout: float
    layer_postprocess_dropout: float
    cnn_dropout_prob: float
    bn_momentum: float
    bn_epsilon: float
    reduction_factor: int
    infer_max_steps: int
    dtype_: Any
    mode: str
    # windowed monotonic attention forcing at inference (reference
    # `parts/transformer/attention_layer.py:160-181`): for forced
    # layers, step t may only attend inside
    # [pos_{t-1} - back_step_size, pos_{t-1} - back_step_size +
    #  window_size) where pos_{t-1} is the previous step's alignment
    # argmax per layer/head.
    window_size: Any = None
    back_step_size: int = 0
    force_layers: Any = None    # tuple of layer indices, None = all

    def _build(self):
        """Create submodules once; shared by teacher pass and decode."""
        blocks = []
        for i, spec in enumerate(self.conv_layers):
            blocks.append({
                "conv": nn.Conv(spec["num_channels"],
                                kernel_size=(spec["kernel_size"][0],),
                                padding="CAUSAL", dtype=self.dtype_,
                                param_dtype=jnp.float32,
                                name="conv{}".format(i + 1)),
                "bn": nn.BatchNorm(momentum=self.bn_momentum,
                                   epsilon=self.bn_epsilon,
                                   dtype=self.dtype_,
                                   param_dtype=jnp.float32,
                                   name="bn{}".format(i + 1)),
                "q": nn.Dense(self.hidden_size, dtype=self.dtype_,
                              param_dtype=jnp.float32,
                              name="att_q{}".format(i + 1)),
                "kv": nn.Dense(2 * self.hidden_size, dtype=self.dtype_,
                               param_dtype=jnp.float32,
                               name="att_kv{}".format(i + 1)),
                "o": nn.Dense(self.hidden_size, dtype=self.dtype_,
                              param_dtype=jnp.float32,
                              name="att_o{}".format(i + 1)),
            })
        mods = {
            "blocks": blocks,
            "prenets": [nn.Dense(self.prenet_hidden_size,
                                 dtype=self.dtype_,
                                 param_dtype=jnp.float32,
                                 name="prenet{}".format(i + 1))
                        for i in range(self.prenet_layers)],
            "pre_proj": nn.Dense(self.hidden_size, dtype=self.dtype_,
                                 param_dtype=jnp.float32,
                                 name="pre_proj"),
            "frame": nn.Dense(self.num_audio_features *
                              self.reduction_factor, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="frame"),
            "stop": nn.Dense(self.reduction_factor, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="stop"),
        }
        return mods

    def _stack(self, mods, frames_in, memory, enc_mask, train, rng,
               positions=None):
        """frames_in (B, T, F) previous frames -> (frame_out, stop,
        aligns) with aligns (L, B, nh, T, S) attention weights;
        ``positions`` (L, B, nh, T) are per-query window bases for
        monotonic forcing (None disables)."""
        B, T, F = frames_in.shape
        h = frames_in.astype(self.dtype_)
        for i, dense in enumerate(mods["prenets"]):
            h = jax.nn.relu(dense(h))
            # prenet dropout always on (Tacotron/Centaur convention)
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, jnp.zeros_like(h))
        h = mods["pre_proj"](h)
        pos = get_position_encoding(T, self.hidden_size)
        h = h + jnp.asarray(pos, h.dtype)[None]

        nh = self.attention_heads
        dh = self.hidden_size // nh
        aligns = []
        for li, blk in enumerate(mods["blocks"]):
            # causal conv sub-block
            y = blk["conv"](h)
            y = blk["bn"](y, use_running_average=not train)
            y = jax.nn.relu(y)
            y = Dropout(rate=self.cnn_dropout_prob,
                           deterministic=not train)(y)
            h = (h + y) if y.shape == h.shape else y
            # cross-attention sub-block
            q = blk["q"](h).reshape(B, T, nh, dh)
            kv = blk["kv"](memory)
            k, v = jnp.split(kv, 2, axis=-1)
            k = k.reshape(B, -1, nh, dh)
            v = v.reshape(B, -1, nh, dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * dh ** -0.5, k,
                                preferred_element_type=jnp.float32)
            logits = jnp.where(enc_mask[:, None, None, :], logits, _NEG)
            if (positions is not None and self.window_size is not None
                    and (self.force_layers is None
                         or li in self.force_layers)):
                wpos = jnp.maximum(
                    positions[li] - self.back_step_size, 0)   # (B,nh,T)
                k_idx = jnp.arange(logits.shape[-1])[None, None, None, :]
                win = ((k_idx >= wpos[..., None]) &
                       (k_idx < (wpos + self.window_size)[..., None]))
                logits = jnp.where(win, logits, _NEG)
            w = jax.nn.softmax(logits, axis=-1)
            aligns.append(w)
            w = Dropout(rate=self.attention_dropout,
                           deterministic=not train)(w)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", w.astype(self.dtype_), v)
            ctx = blk["o"](ctx.reshape(B, T, nh * dh))
            h = h + Dropout(rate=self.layer_postprocess_dropout,
                               deterministic=not train)(ctx)
        frame = mods["frame"](h.astype(jnp.float32))
        stop = mods["stop"](h.astype(jnp.float32))
        # un-reduce: (B, T, r*F) -> (B, T*r, F)
        r = self.reduction_factor
        frame = frame.reshape(B, T * r, F)
        stop = stop.reshape(B, T * r)
        return frame, stop, jnp.stack(aligns).astype(jnp.float32)

    @nn.compact
    def __call__(self, input_dict: Dict[str, Any], train: bool):
        enc = input_dict["encoder_output"]
        memory = enc["outputs"]
        mem_len = enc["src_length"]
        B, S, _ = memory.shape
        F = self.num_audio_features
        r = self.reduction_factor
        enc_mask = jnp.arange(S)[None, :] < mem_len[:, None]
        mods = self._build()
        rng = self.make_rng("dropout")

        targets = input_dict.get("target_tensors")
        out: Dict[str, Any] = {}
        if targets is not None and self.mode != "infer":
            spec, stop_t, spec_len = targets[:3]
            spec = spec.astype(jnp.float32)
            T = spec.shape[1] // r * r
            spec = spec[:, :T]
            # reduced-rate decoder inputs: previous frame group
            grouped = spec.reshape(B, T // r, r * F)
            dec_in = jnp.concatenate(
                [jnp.zeros((B, 1, r * F)), grouped[:, :-1]], axis=1)
            dec_in = dec_in.reshape(B, (T // r), r, F)[:, :, -1, :]
            # feed last frame of each group (standard reduction trick)
            frame, stop, aligns = self._stack(mods, dec_in, memory,
                                              enc_mask, train, rng)
            out.update({"decoder_spec": frame,
                        "post_net_spec": frame,
                        "stop_token_logits": stop,
                        "alignments": aligns[-1].mean(axis=1),
                        "lengths": spec_len,
                        "outputs": [frame, spec_len]})

        if self.mode == "infer":
            T_groups = self.infer_max_steps // r

            if self.is_initializing():
                # materialize params with one eager pass (no fori_loop
                # param creation)
                frame, stop, _ = self._stack(
                    mods, jnp.zeros((B, T_groups, F)), memory, enc_mask,
                    False, rng)
                return {"decoder_spec": frame, "post_net_spec": frame,
                        "stop_token_logits": stop,
                        "alignments": jnp.zeros((B, 1, S)),
                        "lengths": jnp.ones((B,), jnp.int32),
                        "outputs": [frame, jnp.ones((B,), jnp.int32)]}

            L = len(self.conv_layers)
            nh = self.attention_heads
            windowing = self.window_size is not None

            def body(i, buf):
                frames_buf, stops_buf, pos_buf = buf
                frame, stop, aligns = self._stack(
                    mods, frames_buf, memory, enc_mask, False, rng,
                    positions=pos_buf if windowing else None)
                # frame (B, T_groups*r, F): take group i output, write
                # its LAST frame as input for group i+1
                grp = jax.lax.dynamic_slice_in_dim(frame, i * r, r,
                                                   axis=1)
                last = grp[:, -1, :]
                frames_buf = jax.lax.dynamic_update_slice(
                    frames_buf, last[:, None, :], (0, i + 1, 0))
                stops_buf = jax.lax.dynamic_update_slice(
                    stops_buf,
                    jax.lax.dynamic_slice_in_dim(stop, i * r, r, axis=1),
                    (0, i * r))
                # record step i's alignment argmax as step i+1's window
                # base (reference `centaur_decoder.py:511-517`)
                new_pos = jnp.argmax(
                    jax.lax.dynamic_slice_in_dim(aligns, i, 1, axis=3),
                    axis=-1).astype(jnp.int32)          # (L,B,nh,1)
                pos_buf = jax.lax.dynamic_update_slice(
                    pos_buf, new_pos, (0, 0, 0, i + 1))
                return (frames_buf, stops_buf, pos_buf)

            frames_buf = jnp.zeros((B, T_groups, F))
            stops_buf = jnp.zeros((B, T_groups * r))
            pos_buf = jnp.zeros((L, B, nh, T_groups), jnp.int32)
            frames_buf, stops_buf, pos_buf = jax.lax.fori_loop(
                0, T_groups - 1, body, (frames_buf, stops_buf, pos_buf))
            frame, stop, aligns = self._stack(
                mods, frames_buf, memory, enc_mask, False, rng,
                positions=pos_buf if windowing else None)
            stopped = jax.nn.sigmoid(stop) > 0.5
            seen = jnp.cumsum(stopped.astype(jnp.int32), axis=1)
            out_len = jnp.sum((seen == 0).astype(jnp.int32), axis=1)
            out_len = jnp.clip(out_len + 1, 1, frame.shape[1])
            out.update({"decoder_spec": frame, "post_net_spec": frame,
                        "stop_token_logits": stop,
                        "alignments": aligns[-1].mean(axis=1),
                        "lengths": out_len,
                        "outputs": [frame, out_len]})
        return out


class CentaurDecoder(Decoder):
    """Config wrapper; schema mirrors the reference
    (`centaur_decoder.py:20-48`)."""

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "prenet_layers": int,
            "prenet_hidden_size": int,
            "hidden_size": int,
            "conv_layers": list,
            "mag_conv_layers": None,
            "attention_dropout": float,
            "layer_postprocess_dropout": float,
        })

    @staticmethod
    def get_optional_params():
        return dict(Decoder.get_optional_params(), **{
            "prenet_activation_fn": None,
            "prenet_dropout": float,
            "prenet_use_inference_dropout": bool,
            "cnn_dropout_prob": float,
            "bn_momentum": float,
            "bn_epsilon": float,
            "reduction_factor": int,
            "attention_layers": int,
            "self_attention_conv_params": dict,
            "attention_heads": int,
            "attention_cnn_dropout_prob": float,
            "window_size": int,
            "back_step_size": int,
            "force_layers": list,
            "num_audio_features": int,
            "infer_max_steps": int,
        })

    def make_module(self):
        p = self._params
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        return CentaurDecoderModule(
            num_audio_features=p["num_audio_features"],
            prenet_layers=p["prenet_layers"],
            prenet_hidden_size=p["prenet_hidden_size"],
            hidden_size=p["hidden_size"],
            conv_layers=tuple(p["conv_layers"]),
            attention_heads=p.get("attention_heads", 1),
            attention_dropout=p["attention_dropout"],
            layer_postprocess_dropout=p["layer_postprocess_dropout"],
            cnn_dropout_prob=p.get("cnn_dropout_prob", 0.5),
            bn_momentum=p.get("bn_momentum", 0.95),
            bn_epsilon=p.get("bn_epsilon", 1e-8),
            reduction_factor=p.get("reduction_factor", 1),
            infer_max_steps=p.get("infer_max_steps", 200),
            dtype_=dtype,
            mode=self._mode,
            window_size=p.get("window_size"),
            back_step_size=p.get("back_step_size", 0),
            force_layers=(tuple(p["force_layers"])
                          if "force_layers" in p else None))
