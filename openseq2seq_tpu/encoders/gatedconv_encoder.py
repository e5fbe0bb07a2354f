"""Gated-conv ASR encoder — the `docs/extending-walkthrough.md`
tutorial artifact, shipped so the walkthrough's code is real and
CI-tested (`tests/test_extending_tutorial.py` trains it to WER 0 on
the toy corpus). Stride-2 conv front end, then N residual gated-conv
blocks (LN -> conv(2D) -> GLU -> dropout). No reference counterpart;
the extension contract it demonstrates mirrors the reference's
`extending/adding-new-encoder.rst` stub."""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ..parts.dropout import Dropout
from .encoder import Encoder
from .tdnn_encoder import _mask_time, _out_length


class GatedConvNet(nn.Module):
    """Stride-2 front end, then N gated conv blocks with layer norm."""
    num_layers: int
    hidden_size: int
    kernel_size: int
    dropout: float
    dtype_: Any

    @nn.compact
    def __call__(self, feats, lengths, train: bool):
        x = feats.astype(self.dtype_)
        x = nn.Conv(self.hidden_size, kernel_size=(self.kernel_size,),
                    strides=(2,), padding="SAME", dtype=self.dtype_,
                    param_dtype=jnp.float32, name="front")(x)
        lengths = _out_length(lengths, 2)
        for i in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype_,
                             param_dtype=jnp.float32)(x)
            h = nn.Conv(2 * self.hidden_size,
                        kernel_size=(self.kernel_size,),
                        padding="SAME", dtype=self.dtype_,
                        param_dtype=jnp.float32,
                        name=f"conv{i}")(h)
            h = nn.glu(h, axis=-1)                  # gated linear unit
            h = Dropout(rate=self.dropout,
                        deterministic=not train)(h)
            x = x + h                               # residual
        # zero padded frames so downstream CTC/attention never sees them
        return _mask_time(x, lengths), lengths


class GatedConvEncoder(Encoder):
    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "num_layers": int,
            "hidden_size": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "kernel_size": int,
            "dropout_keep_prob": float,
        })

    def make_module(self):
        p = self._params
        net = GatedConvNet(
            num_layers=p["num_layers"],
            hidden_size=p["hidden_size"],
            kernel_size=p.get("kernel_size", 5),
            dropout=1.0 - p.get("dropout_keep_prob", 0.9),
            dtype_=self.compute_dtype,     # bf16 under dtype: "mixed"
        )

        class GatedConvEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x, lengths = input_dict["source_tensors"][:2]
                outputs, out_len = self.net(x, lengths, train)
                return {"outputs": outputs, "src_length": out_len}

        return GatedConvEncoderModule(net=net)
