"""Generic CNN encoder built from a config-described layer list
(reference `open_seq2seq/encoders/cnn_encoder.py:86-181`, used for
AlexNet/CIFAR-style models).

The reference lists (tf.layers.conv2d, {...}) tuples; here layers are
described by dicts: {"type": "conv2d"|"max_pool"|"avg_pool"|"dense"|
"dropout"|"flatten"|"batch_norm", ...params}. Tuples of (callable-name,
params) are also accepted for config-shape parity.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax.numpy as jnp

from .encoder import Encoder
from .tdnn_encoder import resolve_activation


def _norm_spec(spec) -> Dict[str, Any]:
    from collections.abc import Mapping
    if isinstance(spec, Mapping):   # plain dict or flax FrozenDict
        return dict(spec)
    if isinstance(spec, (tuple, list)) and len(spec) == 2:
        kind, params = spec
        if not isinstance(kind, str):
            kind = getattr(kind, "__name__", str(kind))
        out = {"type": kind.replace("conv2d", "conv2d")
               .replace("max_pooling2d", "max_pool")
               .replace("average_pooling2d", "avg_pool")}
        out.update(params)
        return out
    raise ValueError("Bad cnn layer spec: {!r}".format(spec))


class CNNNet(nn.Module):
    cnn_layers: tuple
    fc_layers: tuple
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        idx = 0
        for raw in list(self.cnn_layers) + list(self.fc_layers):
            spec = _norm_spec(raw)
            kind = spec["type"]
            idx += 1
            name = "{}_{}".format(kind, idx)
            act = spec.get("activation")
            if kind in ("conv2d", "conv"):
                k = spec["kernel_size"]
                k = (k, k) if isinstance(k, int) else tuple(k)
                s = spec.get("strides", (1, 1))
                s = (s, s) if isinstance(s, int) else tuple(s)
                x = nn.Conv(spec["filters"], k, strides=s,
                            padding=spec.get("padding", "SAME").upper(),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=name)(x)
            elif kind == "max_pool":
                k = spec.get("pool_size", 2)
                k = (k, k) if isinstance(k, int) else tuple(k)
                s = spec.get("strides", k)
                s = (s, s) if isinstance(s, int) else tuple(s)
                x = nn.max_pool(x, k, strides=s,
                                padding=spec.get("padding", "VALID").upper())
            elif kind == "avg_pool":
                k = spec.get("pool_size", 2)
                k = (k, k) if isinstance(k, int) else tuple(k)
                s = spec.get("strides", k)
                s = (s, s) if isinstance(s, int) else tuple(s)
                x = nn.avg_pool(x, k, strides=s,
                                padding=spec.get("padding", "VALID").upper())
            elif kind in ("dense", "fc"):
                if x.ndim > 2:
                    x = x.reshape(x.shape[0], -1)
                x = nn.Dense(spec["units"], dtype=self.dtype,
                             param_dtype=jnp.float32, name=name)(x)
            elif kind == "flatten":
                x = x.reshape(x.shape[0], -1)
            elif kind == "dropout":
                x = Dropout(rate=spec.get("rate", 0.5),
                               deterministic=not train)(x)
            elif kind in ("batch_norm", "bn"):
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=spec.get("momentum", 0.9),
                                 epsilon=spec.get("epsilon", 1e-4),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=name)(x)
            else:
                raise ValueError("Unknown cnn layer type '{}'".format(kind))
            if act is not None:
                x = resolve_activation(act)(x)
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        return x


class CNNEncoder(Encoder):

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "cnn_layers": list,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "data_format": ["channels_first", "channels_last"],
            "fc_layers": list,
        })

    def make_module(self):
        p = self._params
        net = CNNNet(cnn_layers=tuple(p["cnn_layers"]),
                     fc_layers=tuple(p.get("fc_layers", [])),
                     dtype=self.compute_dtype)

        class CNNEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x = input_dict["source_tensors"][0]
                return {"outputs": self.net(x, train)}

        return CNNEncoderModule(net=net)
