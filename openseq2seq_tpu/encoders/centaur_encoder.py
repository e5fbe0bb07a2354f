"""Centaur encoder (reference
`open_seq2seq/encoders/centaur_encoder.py:9-126` +
`parts/centaur/ConvBlock`): char embedding -> conv-BN-relu-dropout
blocks -> linear projection to ``output_size``."""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp

from .encoder import Encoder
from .tdnn_encoder import _mask_time


class CentaurEncoderModule(nn.Module):
    src_vocab_size: int
    embedding_size: int
    output_size: int
    conv_layers: tuple
    cnn_dropout_prob: float
    bn_momentum: float
    bn_epsilon: float
    dtype_: Any

    @nn.compact
    def __call__(self, input_dict: Dict[str, Any], train: bool):
        ids, lengths = input_dict["source_tensors"][:2]
        emb = self.param("embedding", nn.initializers.normal(0.1),
                         (self.src_vocab_size, self.embedding_size),
                         jnp.float32)
        x = jnp.take(emb.astype(self.dtype_), ids, axis=0)
        for i, spec in enumerate(self.conv_layers):
            x = _mask_time(x, lengths)
            x = nn.Conv(spec["num_channels"],
                        kernel_size=(spec["kernel_size"][0],),
                        strides=(spec.get("stride", [1])[0],),
                        padding=spec.get("padding", "SAME"),
                        dtype=self.dtype_, param_dtype=jnp.float32,
                        name="conv{}".format(i + 1))(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=self.bn_epsilon, dtype=self.dtype_,
                             param_dtype=jnp.float32,
                             name="bn{}".format(i + 1))(x)
            x = jax.nn.relu(x)
            x = Dropout(rate=self.cnn_dropout_prob,
                           deterministic=not train)(x)
        x = nn.Dense(self.output_size, dtype=self.dtype_,
                     param_dtype=jnp.float32, name="proj")(x)
        x = _mask_time(x, lengths)
        return {"outputs": x, "src_length": lengths}


class CentaurEncoder(Encoder):
    """Config wrapper; schema mirrors the reference
    (`centaur_encoder.py:15-32`)."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "src_vocab_size": int,
            "embedding_size": int,
            "output_size": int,
            "conv_layers": list,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "pad_embeddings_2_eight": bool,
            "bn_momentum": float,
            "bn_epsilon": float,
            "cnn_dropout_prob": float,
            "norm_type": str,
        })

    def make_module(self):
        p = self._params
        return CentaurEncoderModule(
            src_vocab_size=p["src_vocab_size"],
            embedding_size=p["embedding_size"],
            output_size=p["output_size"],
            conv_layers=tuple(p["conv_layers"]),
            cnn_dropout_prob=p.get("cnn_dropout_prob", 0.5),
            bn_momentum=p.get("bn_momentum", 0.95),
            bn_epsilon=p.get("bn_epsilon", 1e-8),
            dtype_=self.compute_dtype)
