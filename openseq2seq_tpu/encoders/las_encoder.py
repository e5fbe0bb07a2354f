"""Listen-Attend-Spell encoder (reference
`open_seq2seq/encoders/las_encoder.py:49-238`): conv "listener" front
end followed by recurrent layers described by ``recurrent_layers``
specs (each with optional time pooling — the LAS pyramid)."""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from .encoder import Encoder
from .tdnn_encoder import TDNNNet, resolve_activation, _mask_time
from ..parts.rnns.rnn import BiRNN, GRU, LSTM


class LASNet(nn.Module):
    convnet_layers: tuple
    recurrent_layers: tuple
    activation_fn: Any
    dropout_keep_prob: float
    normalization: Any
    bn_momentum: float
    bn_epsilon: float
    dtype_: Any

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        conv = TDNNNet(
            convnet_layers=self.convnet_layers,
            activation_fn=self.activation_fn,
            dropout_keep_prob=self.dropout_keep_prob,
            normalization=self.normalization,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            use_conv_mask=True,
            drop_block_prob=0.0,
            drop_block_index=-1,
            dtype=self.dtype_,
            name="listener_convs")
        x, lengths = conv(x, lengths, train)

        for i, spec in enumerate(self.recurrent_layers):
            units = spec["num_units"]
            cell_type = str(spec.get("type", "lstm")).lower()
            pool = spec.get("pool", 1)          # LAS pyramid reduction
            bidirectional = not spec.get("unidirectional", False)
            name = "rnn{}".format(i + 1)
            if pool > 1:
                T = x.shape[1] // pool * pool
                x = x[:, :T].reshape(x.shape[0], T // pool,
                                     pool * x.shape[2])
                lengths = jnp.maximum(lengths // pool, 1)
            if bidirectional:
                x = BiRNN(units, cell_type=cell_type, dtype=self.dtype_,
                          name=name)(x, lengths)
            elif cell_type == "gru":
                x, _ = GRU(units, dtype=self.dtype_, name=name)(x, lengths)
            else:
                x, _ = LSTM(units, dtype=self.dtype_,
                            name=name)(x, lengths)
            keep = spec.get("dropout_keep_prob", self.dropout_keep_prob)
            if train and keep < 1.0:
                x = nn.Dropout(rate=1.0 - keep,
                               deterministic=not train)(x)
        x = _mask_time(x, lengths)
        return x, lengths


class ListenAttendSpellEncoder(Encoder):
    """Config wrapper; schema mirrors the reference
    (`las_encoder.py:55-70`)."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "dropout_keep_prob": float,
            "recurrent_layers": list,
            "convnet_layers": list,
            "activation_fn": None,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "data_format": ["channels_first", "channels_last"],
            "normalization": [None, "batch_norm"],
            "bn_momentum": float,
            "bn_epsilon": float,
        })

    def make_module(self):
        p = self._params
        net = LASNet(
            convnet_layers=tuple(p["convnet_layers"]),
            recurrent_layers=tuple(p["recurrent_layers"]),
            activation_fn=resolve_activation(p["activation_fn"]),
            dropout_keep_prob=p["dropout_keep_prob"],
            normalization=p.get("normalization", "batch_norm"),
            bn_momentum=p.get("bn_momentum", 0.90),
            bn_epsilon=p.get("bn_epsilon", 1e-3),
            dtype_=self.compute_dtype)

        class LASEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x, lengths = input_dict["source_tensors"][:2]
                outputs, out_len = self.net(x, lengths, train)
                return {"outputs": outputs, "src_length": out_len}

        return LASEncoderModule(net=net)
