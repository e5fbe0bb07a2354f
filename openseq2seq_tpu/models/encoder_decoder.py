"""Standard encoder->decoder->loss composition (reference
`open_seq2seq/models/encoder_decoder.py:10-190`)."""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from .model import Model


class EncoderDecoderModel(Model):
    """Model composed of an encoder, a decoder and a loss component, all
    instantiated from config classes + params dicts."""

    @staticmethod
    def get_required_params():
        return dict(Model.get_required_params(), **{
            "encoder": None,
            "decoder": None,
        })

    @staticmethod
    def get_optional_params():
        return dict(Model.get_optional_params(), **{
            "encoder_params": dict,
            "decoder_params": dict,
            "loss": None,
            "loss_params": dict,
        })

    def __init__(self, params, mode="train", mesh=None,
                 num_workers=1, worker_id=0):
        super().__init__(params, mode, mesh, num_workers, worker_id)
        self._encoder = self._create_encoder()
        self._decoder = self._create_decoder()
        self._loss_computator = (self._create_loss()
                                 if mode in ("train", "eval") else None)

    def _inherit_initializer(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """If the component sets no initializer, the model-level one
        applies (reference `encoders/encoder.py:68-69`: "If no
        initializer is provided, model initializer will be used")."""
        if "initializer" not in params and \
                self._params.get("initializer") is not None:
            params["initializer"] = self._params["initializer"]
            if self._params.get("initializer_params") is not None:
                params.setdefault("initializer_params",
                                  self._params["initializer_params"])
        return params

    def _create_encoder(self):
        params = self._inherit_initializer(
            dict(self._params.get("encoder_params", {})))
        return self._params["encoder"](params=params, model=self,
                                       mode=self._mode)

    def _create_decoder(self):
        params = self._inherit_initializer(
            dict(self._params.get("decoder_params", {})))
        return self._params["decoder"](params=params, model=self,
                                       mode=self._mode)

    def _create_loss(self):
        if self._params.get("loss") is None:
            return None
        params = dict(self._params.get("loss_params", {}))
        return self._params["loss"](params=params, model=self)

    @property
    def encoder(self):
        return self._encoder

    @property
    def decoder(self):
        return self._decoder

    @property
    def loss_computator(self):
        return self._loss_computator

    def build_module(self):
        class ForwardPass(nn.Module):
            enc: nn.Module
            dec: nn.Module

            @nn.compact
            def __call__(self, batch: Dict[str, Any], train: bool):
                encoder_output = self.enc(batch, train)
                dec_input = dict(batch)
                dec_input["encoder_output"] = encoder_output
                decoder_output = self.dec(dec_input, train)
                return {"encoder_output": encoder_output,
                        "decoder_output": decoder_output}

        return ForwardPass(enc=self._encoder.make_module(),
                           dec=self._decoder.make_module())

    def compute_loss(self, outputs, batch):
        if self._loss_computator is None:
            raise ValueError("No loss was configured (infer-only model?)")
        input_dict = {
            "decoder_output": outputs["decoder_output"],
            "target_tensors": batch.get("target_tensors"),
        }
        return self._loss_computator.compute_loss(input_dict)
