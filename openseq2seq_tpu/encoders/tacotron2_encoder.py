"""Tacotron-2 encoder (reference
`open_seq2seq/encoders/tacotron2_encoder.py:18-505`):
char embedding -> conv bank (conv-BN-relu-dropout) -> bidirectional
LSTM. GST style embedding hooks are accepted in the schema; the
reference-parity GST module lands with the style-transfer work.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoder import Encoder
from .tdnn_encoder import resolve_activation, _mask_time
from ..parts.rnns.rnn import BiRNN


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
            x = nn.Dropout(rate=self.cnn_dropout_prob,
                           deterministic=not train)(x)
            if s > 1:
                lengths = (lengths + s - 1) // s

        for i in range(self.num_rnn_layers):
            x = BiRNN(self.rnn_cell_dim, cell_type=self.rnn_type,
                      dtype=self.dtype_, name="rnn{}".format(i + 1))(
                x, lengths)
            x = nn.Dropout(rate=self.rnn_dropout_prob,
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

        class Tacotron2EncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                ids, lengths = input_dict["source_tensors"][:2]
                outputs, out_len = self.net(ids, lengths, train)
                return {"outputs": outputs, "src_length": out_len}

        return Tacotron2EncoderModule(net=net)
