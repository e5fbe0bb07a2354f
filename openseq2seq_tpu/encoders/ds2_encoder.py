"""DeepSpeech-2 encoder (reference
`open_seq2seq/encoders/ds2_encoder.py:86-401`).

conv2d stack over the (time, frequency) plane -> (bi)directional RNN
stack -> optional row convolution -> fully-connected layer.

TPU design: data lives as (B, T, F, C) NHWC so XLA tiles the convs on
the MXU without transposes (the reference juggles channels_first for
cuDNN); the cuDNN fused RNNs map to the scan kernels in
``parts/rnns/rnn.py`` whose per-step work is just the recurrent matmul.
Row conv is a depthwise 1-D conv over a centered window (SAME padding),
exactly the reference's "in-plane" conv (`ds2_encoder.py:38-85`).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .encoder import Encoder
from .tdnn_encoder import resolve_activation, _mask_time
from ..parts.rnns.rnn import BiRNN, GRU, LSTM


class DS2Net(nn.Module):
    conv_layers: tuple
    num_rnn_layers: int
    rnn_cell_dim: int
    rnn_type: str
    rnn_unidirectional: bool
    row_conv: bool
    row_conv_width: int
    n_hidden: int
    dropout_keep_prob: float
    activation_fn: Any
    bn_momentum: float
    bn_epsilon: float
    dtype: Any

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        x = x.astype(self.dtype)[..., None]          # (B, T, F, 1)
        keep = self.dropout_keep_prob if train else 1.0

        for i, spec in enumerate(self.conv_layers):
            kt, kf = spec["kernel_size"]
            st, sf = spec["stride"]
            x = nn.Conv(spec["num_channels"], kernel_size=(kt, kf),
                        strides=(st, sf),
                        padding=spec.get("padding", "SAME"),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv{}".format(i + 1))(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=self.bn_epsilon, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="conv{}_bn".format(i + 1))(x)
            x = self.activation_fn(x)
            if st > 1:
                lengths = (lengths + st - 1) // st

        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x = _mask_time(x, lengths)

        if keep < 1.0:
            x = Dropout(rate=1.0 - keep, deterministic=not train)(x)
        for i in range(self.num_rnn_layers):
            name = "rnn{}".format(i + 1)
            if self.rnn_unidirectional:
                if self.rnn_type in ("gru", "cudnn_gru"):
                    x, _ = GRU(self.rnn_cell_dim, dtype=self.dtype,
                               name=name)(x, lengths)
                else:
                    x, _ = LSTM(self.rnn_cell_dim, dtype=self.dtype,
                                name=name)(x, lengths)
            else:
                x = BiRNN(self.rnn_cell_dim, cell_type=self.rnn_type,
                          dtype=self.dtype, name=name)(x, lengths)
            if keep < 1.0:
                x = Dropout(rate=1.0 - keep,
                               deterministic=not train)(x)
            # layer-boundary remat anchor (model remat="blocks" policy)
            x = checkpoint_name(x, "block_boundary")

        if self.row_conv and self.row_conv_width >= 2:
            ch = x.shape[-1]
            y = nn.Conv(ch, kernel_size=(self.row_conv_width,),
                        feature_group_count=ch, padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="row_conv")(x)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=self.bn_epsilon, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="row_conv_bn")(y)
            x = self.activation_fn(y)

        x = nn.Dense(self.n_hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fully_connected")(x)
        x = self.activation_fn(x)
        if keep < 1.0:
            x = Dropout(rate=1.0 - keep, deterministic=not train)(x)
        x = _mask_time(x, lengths)
        return x, lengths


class DeepSpeech2Encoder(Encoder):
    """Config wrapper; schema mirrors the reference
    (`ds2_encoder.py:88-112`)."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "dropout_keep_prob": float,
            "conv_layers": list,
            "activation_fn": None,
            "num_rnn_layers": int,
            "row_conv": bool,
            "n_hidden": int,
            "use_cudnn_rnn": bool,
            "rnn_cell_dim": int,
            "rnn_type": ["layernorm_lstm", "lstm", "gru",
                         "cudnn_gru", "cudnn_lstm"],
            "rnn_unidirectional": bool,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "row_conv_width": int,
            "data_format": ["channels_first", "channels_last",
                            "BCTF", "BTFC", "BCFT", "BFTC"],
            "bn_momentum": float,
            "bn_epsilon": float,
        })

    def make_module(self):
        p = self._params
        net = DS2Net(
            conv_layers=tuple(p["conv_layers"]),
            num_rnn_layers=p["num_rnn_layers"],
            rnn_cell_dim=p["rnn_cell_dim"],
            rnn_type=p["rnn_type"],
            rnn_unidirectional=p["rnn_unidirectional"],
            row_conv=p["row_conv"],
            row_conv_width=p.get("row_conv_width", 8),
            n_hidden=p["n_hidden"],
            dropout_keep_prob=p["dropout_keep_prob"],
            activation_fn=resolve_activation(p["activation_fn"]),
            bn_momentum=p.get("bn_momentum", 0.99),
            bn_epsilon=p.get("bn_epsilon", 1e-3),
            dtype=self.compute_dtype)

        class DS2EncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x, lengths = input_dict["source_tensors"][:2]
                outputs, out_len = self.net(x, lengths, train)
                return {"outputs": outputs, "src_length": out_len}

        return DS2EncoderModule(net=net)
