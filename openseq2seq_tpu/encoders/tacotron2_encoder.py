"""Tacotron-2 encoder (reference
`open_seq2seq/encoders/tacotron2_encoder.py:18-505`):
char embedding -> conv bank (conv-BN-relu-dropout) -> bidirectional
LSTM. GST style embedding hooks are accepted in the schema; the
reference-parity GST module lands with the style-transfer work.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp

from .encoder import Encoder
from .tdnn_encoder import resolve_activation, _mask_time
from ..parts.rnns.rnn import BiRNN


class GSTNet(nn.Module):
    """Global Style Tokens (reference `tacotron2_encoder.py`
    style_embedding branch): a conv+GRU reference encoder summarizes a
    style spectrogram; multi-head attention over a learned token bank
    yields the style embedding."""
    num_tokens: int
    num_units: int         # style embedding size
    num_heads: int
    conv_channels: tuple
    rnn_units: int
    dtype_: Any

    @nn.compact
    def __call__(self, style_spec, train: bool):
        x = style_spec.astype(self.dtype_)[..., None]     # (B, T, F, 1)
        for i, ch in enumerate(self.conv_channels):
            x = nn.Conv(ch, kernel_size=(3, 3), strides=(2, 2),
                        padding="SAME", dtype=self.dtype_,
                        param_dtype=jnp.float32,
                        name="ref_conv{}".format(i + 1))(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype_, param_dtype=jnp.float32,
                             name="ref_bn{}".format(i + 1))(x)
            x = jax.nn.relu(x)
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        from ..parts.rnns.rnn import GRU
        _, last = GRU(self.rnn_units, dtype=self.dtype_,
                      name="ref_gru")(x, jnp.full((B,), T, jnp.int32))
        query = last.astype(jnp.float32)                  # (B, rnn)

        tokens = self.param("style_tokens",
                            nn.initializers.normal(0.3),
                            (self.num_tokens,
                             self.num_units // self.num_heads),
                            jnp.float32)
        dh = self.num_units // self.num_heads
        q = nn.Dense(self.num_units, dtype=jnp.float32,
                     name="style_q")(query).reshape(B, self.num_heads, dh)
        keys = nn.Dense(self.num_units, dtype=jnp.float32,
                        name="style_k")(jnp.tanh(tokens)).reshape(
            self.num_tokens, self.num_heads, dh)
        vals = jnp.tanh(tokens)                            # (N, dh)
        scores = jnp.einsum("bhd,nhd->bhn", q * dh ** -0.5, keys)
        w = jax.nn.softmax(scores, axis=-1)
        style = jnp.einsum("bhn,nd->bhd", w, vals).reshape(B, -1)
        return style.astype(self.dtype_)                   # (B, units)


class Tacotron2Net(nn.Module):
    src_vocab_size: int
    src_emb_size: int
    conv_layers: tuple
    activation_fn: Any
    cnn_dropout_prob: float
    rnn_dropout_prob: float
    num_rnn_layers: int
    rnn_cell_dim: int
    rnn_unidirectional: bool
    rnn_type: str
    bn_momentum: float
    bn_epsilon: float
    dtype_: Any

    @nn.compact
    def __call__(self, ids, lengths, train: bool):
        emb = self.param("embedding", nn.initializers.normal(0.5),
                         (self.src_vocab_size, self.src_emb_size),
                         jnp.float32)
        x = jnp.take(emb.astype(self.dtype_), ids, axis=0)

        for i, spec in enumerate(self.conv_layers):
            k = spec["kernel_size"][0]
            s = spec.get("stride", [1])[0]
            x = _mask_time(x, lengths)
            x = nn.Conv(spec["num_channels"], kernel_size=(k,),
                        strides=(s,), padding=spec.get("padding", "SAME"),
                        dtype=self.dtype_, param_dtype=jnp.float32,
                        name="conv{}".format(i + 1))(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=self.bn_epsilon, dtype=self.dtype_,
                             param_dtype=jnp.float32,
                             name="bn{}".format(i + 1))(x)
            x = self.activation_fn(x)
            x = Dropout(rate=self.cnn_dropout_prob,
                           deterministic=not train)(x)
            if s > 1:
                lengths = (lengths + s - 1) // s

        for i in range(self.num_rnn_layers):
            x = BiRNN(self.rnn_cell_dim, cell_type=self.rnn_type,
                      dtype=self.dtype_, name="rnn{}".format(i + 1))(
                x, lengths)
            x = Dropout(rate=self.rnn_dropout_prob,
                           deterministic=not train)(x)
        x = _mask_time(x, lengths)
        return x, lengths


class Tacotron2Encoder(Encoder):
    """Config wrapper; schema mirrors the reference
    (`tacotron2_encoder.py:26-54`)."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "cnn_dropout_prob": float,
            "rnn_dropout_prob": float,
            "src_emb_size": int,
            "conv_layers": list,
            "activation_fn": None,
            "num_rnn_layers": int,
            "rnn_cell_dim": int,
            "use_cudnn_rnn": bool,
            "rnn_type": None,
            "rnn_unidirectional": bool,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "data_format": ["channels_first", "channels_last"],
            "bn_momentum": float,
            "bn_epsilon": float,
            "zoneout_prob": float,
            "style_embedding_enable": bool,
            "style_embedding_params": dict,
            "src_vocab_size": int,
        })

    def make_module(self):
        p = self._params
        rnn_type = str(p.get("rnn_type", "lstm")).lower()
        net = Tacotron2Net(
            src_vocab_size=p["src_vocab_size"],
            src_emb_size=p["src_emb_size"],
            conv_layers=tuple(p["conv_layers"]),
            activation_fn=resolve_activation(p["activation_fn"]),
            cnn_dropout_prob=p["cnn_dropout_prob"],
            rnn_dropout_prob=p["rnn_dropout_prob"],
            num_rnn_layers=p["num_rnn_layers"],
            rnn_cell_dim=p["rnn_cell_dim"],
            rnn_unidirectional=p["rnn_unidirectional"],
            rnn_type="gru" if "gru" in rnn_type else "lstm",
            bn_momentum=p.get("bn_momentum", 0.1),
            bn_epsilon=p.get("bn_epsilon", 1e-5),
            dtype_=self.compute_dtype)

        gst = None
        if p.get("style_embedding_enable", False):
            sp = p.get("style_embedding_params", {})
            gst = GSTNet(
                num_tokens=sp.get("num_tokens", 10),
                num_units=sp.get("num_units", 128),
                num_heads=sp.get("attention_heads", 4),
                conv_channels=tuple(sp.get("conv_layers",
                                           [32, 32, 64, 64])),
                rnn_units=sp.get("num_rnn_units", 128),
                dtype_=self.compute_dtype)

        class Tacotron2EncoderModule(nn.Module):
            net: nn.Module
            gst: Any

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                ids, lengths = input_dict["source_tensors"][:2]
                outputs, out_len = self.net(ids, lengths, train)
                if self.gst is not None:
                    style_spec = input_dict.get("style_spec")
                    if style_spec is None and \
                            input_dict.get("target_tensors") is not None:
                        style_spec = input_dict["target_tensors"][0]
                    if style_spec is not None:
                        style = self.gst(style_spec, train)
                        outputs = jnp.concatenate(
                            [outputs,
                             jnp.broadcast_to(
                                 style[:, None, :],
                                 (outputs.shape[0], outputs.shape[1],
                                  style.shape[-1]))], axis=-1)
                return {"outputs": outputs, "src_length": out_len}

        return Tacotron2EncoderModule(net=net, gst=gst)
