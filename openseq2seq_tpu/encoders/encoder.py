"""Encoder abstract class.

Mirrors the reference's schema'd ABC (`open_seq2seq/encoders/encoder.py:
16-190`) with a functional twist: instead of building graph ops inside a
variable scope, a concrete encoder implements :meth:`make_module`
returning a ``flax.linen`` module whose ``__call__(input_dict, train)``
maps ``{"source_tensors": [x, x_len]}`` to
``{"outputs": ..., "src_length": ...}``. Mixed precision is handled by
the model-level policy (params fp32, compute bf16/fp16) rather than
per-encoder variable casting.
"""
from __future__ import annotations

import abc
from typing import Any, Dict

from ..utils.params import check_params


class Encoder(abc.ABC):

    @staticmethod
    def get_required_params():
        return {}

    @staticmethod
    def get_optional_params():
        return {
            "initializer": None,          # flax/jax initializer or name
            "initializer_params": dict,
            "regularizer": None,          # 'l2'/'l1' or callable(param)->scalar
            "regularizer_params": dict,
            "dtype": None,                # overrides model compute dtype
        }

    def __init__(self, params: Dict[str, Any], model,
                 name: str = "encoder", mode: str = "train"):
        check_params(params, self.get_required_params(),
                     self.get_optional_params())
        self._params = dict(params)
        self._model = model
        self._name = name
        self._mode = mode

    @property
    def params(self):
        return self._params

    @property
    def mode(self):
        return self._mode

    @property
    def name(self):
        return self._name

    @property
    def compute_dtype(self):
        if self._params.get("dtype") is not None:
            from ..optimizers.mixed_precision import get_mp_policy
            return get_mp_policy(self._params["dtype"]).compute_dtype
        if self._model is not None:
            return self._model.mp_policy.compute_dtype
        import jax.numpy as jnp
        return jnp.float32

    @abc.abstractmethod
    def make_module(self):
        """Return a flax.linen module implementing
        ``__call__(input_dict, train) -> {"outputs", "src_length", ...}``."""
