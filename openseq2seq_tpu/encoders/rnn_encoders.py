"""RNN encoders with embeddings for NMT (reference
`open_seq2seq/encoders/rnn_encoders.py:15,160,320,485`):
unidirectional, bidirectional, and GNMT-style (one bidirectional layer
followed by unidirectional layers with residual connections). The
cuDNN variant maps onto the same scan kernels (`parts/rnns/rnn.py`).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax.numpy as jnp

from .encoder import Encoder
from ..parts.rnns.rnn import BiRNN, GRU, LSTM


def _cell_type_of(params: Dict[str, Any]) -> str:
    cc = str(params.get("core_cell", "") or "lstm").lower()
    return "gru" if "gru" in cc else "lstm"


class _RNNEncBase(nn.Module):
    src_vocab_size: int
    src_emb_size: int
    encoder_layers: int
    cell_units: int
    cell_type: str
    use_skip_connections: bool
    input_keep_prob: float
    output_keep_prob: float
    layout: str           # 'uni' | 'bi' | 'gnmt'
    dtype_: Any

    def _rnn(self, x, lengths, name, train, bidirectional=False):
        if bidirectional:
            return BiRNN(self.cell_units, cell_type=self.cell_type,
                         dtype=self.dtype_, name=name)(x, lengths)
        if self.cell_type == "gru":
            out, _ = GRU(self.cell_units, dtype=self.dtype_,
                         name=name)(x, lengths)
        else:
            out, _ = LSTM(self.cell_units, dtype=self.dtype_,
                          name=name)(x, lengths)
        return out

    @nn.compact
    def __call__(self, ids, lengths, train: bool):
        emb = self.param("embedding", nn.initializers.normal(
            self.src_emb_size ** -0.5),
            (self.src_vocab_size, self.src_emb_size), jnp.float32)
        x = jnp.take(emb.astype(self.dtype_), ids, axis=0)
        drop_in = Dropout(rate=1.0 - self.input_keep_prob,
                             deterministic=not train)
        drop_out = Dropout(rate=1.0 - self.output_keep_prob,
                              deterministic=not train)

        if self.layout == "uni":
            for i in range(self.encoder_layers):
                h = self._rnn(drop_in(x), lengths,
                              "rnn{}".format(i + 1), train)
                x = x + h if (self.use_skip_connections and
                              h.shape == x.shape) else h
                x = drop_out(x)
        elif self.layout == "bi":
            for i in range(self.encoder_layers):
                h = self._rnn(drop_in(x), lengths,
                              "rnn{}".format(i + 1), train,
                              bidirectional=True)
                x = drop_out(h)
        else:  # gnmt: bidi first, then uni with residuals from layer 2
            x = drop_out(self._rnn(drop_in(x), lengths, "bidi", train,
                                   bidirectional=True))
            for i in range(self.encoder_layers - 1):
                h = self._rnn(drop_in(x), lengths,
                              "uni{}".format(i + 1), train)
                if i >= 1 and h.shape == x.shape:
                    x = x + h
                else:
                    x = h
                x = drop_out(x)
        return {"outputs": x, "src_length": lengths}


class _RNNEncoderConfigBase(Encoder):

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "src_vocab_size": int,
            "src_emb_size": int,
            "core_cell": None,
            "core_cell_params": dict,
            "encoder_layers": int,
            "encoder_use_skip_connections": bool,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "encoder_dp_input_keep_prob": float,
            "encoder_dp_output_keep_prob": float,
            "time_major": bool,
            "use_swap_memory": bool,
            "proj_size": int,
            "num_groups": int,
        })

    _layout = "uni"

    def make_module(self):
        p = self._params
        net = _RNNEncBase(
            src_vocab_size=p["src_vocab_size"],
            src_emb_size=p["src_emb_size"],
            encoder_layers=p["encoder_layers"],
            cell_units=p.get("core_cell_params", {}).get(
                "num_units", p["src_emb_size"]),
            cell_type=_cell_type_of(p),
            use_skip_connections=p["encoder_use_skip_connections"],
            input_keep_prob=p.get("encoder_dp_input_keep_prob", 1.0),
            output_keep_prob=p.get("encoder_dp_output_keep_prob", 1.0),
            layout=self._layout,
            dtype_=self.compute_dtype)

        class RNNEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                ids, lengths = input_dict["source_tensors"][:2]
                return self.net(ids, lengths, train)

        return RNNEncoderModule(net=net)


class UnidirectionalRNNEncoderWithEmbedding(_RNNEncoderConfigBase):
    """Reference `rnn_encoders.py:15`."""
    _layout = "uni"


class BidirectionalRNNEncoderWithEmbedding(_RNNEncoderConfigBase):
    """Reference `rnn_encoders.py:160`."""
    _layout = "bi"


class GNMTLikeEncoderWithEmbedding(_RNNEncoderConfigBase):
    """Reference `rnn_encoders.py:320` (and the cuDNN variant at 485 —
    same computation on TPU)."""
    _layout = "gnmt"


GNMTLikeEncoderWithEmbedding_cuDNN = GNMTLikeEncoderWithEmbedding
