"""Loss abstract class (reference `open_seq2seq/losses/loss.py:15`).

A loss is a pure function of decoder output + target tensors; no
variables, no graph state. ``compute_loss`` always returns an fp32
scalar (the reference forces fp32 loss computation for mixed precision).
"""
from __future__ import annotations

import abc
from typing import Any, Dict

from ..utils.params import check_params


class Loss(abc.ABC):

    @staticmethod
    def get_required_params():
        return {}

    @staticmethod
    def get_optional_params():
        return {"dtype": None}

    def __init__(self, params: Dict[str, Any], model, name: str = "loss"):
        check_params(params, self.get_required_params(),
                     self.get_optional_params())
        self._params = dict(params)
        self._model = model
        self._name = name

    @property
    def params(self):
        return self._params

    @abc.abstractmethod
    def compute_loss(self, input_dict: Dict[str, Any]):
        """input_dict has "decoder_output" (dict) and "target_tensors"
        ([y, y_len]); returns fp32 scalar loss."""
