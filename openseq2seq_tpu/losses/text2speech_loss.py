"""Tacotron-style TTS loss (reference
`open_seq2seq/losses/text2speech_loss.py:10-200`): decoder-spec L1/L2 +
postnet-spec L1/L2 + stop-token sigmoid CE, all masked by spectrogram
length; optional extra magnitude-spectrogram term for "both" output."""
from __future__ import annotations

import jax.numpy as jnp

from .loss import Loss


class Text2SpeechLoss(Loss):

    @staticmethod
    def get_optional_params():
        return dict(Loss.get_optional_params(), **{
            "use_mask": bool,
            "l1_norm": bool,
            "scale": float,
            "stop_token_weight": float,
        })

    def __init__(self, params, model, name="text2speech_loss"):
        super().__init__(params, model, name)
        self._use_mask = self._params.get("use_mask", True)
        self._l1 = self._params.get("l1_norm", False)
        self._stop_w = self._params.get("stop_token_weight", 1.0)

    def _spec_loss(self, pred, target, mask):
        diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
        per = jnp.abs(diff) if self._l1 else jnp.square(diff)
        per = per * mask[:, :, None]
        return jnp.sum(per) / jnp.maximum(jnp.sum(mask), 1.0) / \
            pred.shape[-1]

    def compute_loss(self, input_dict):
        dec = input_dict["decoder_output"]
        spec, stop_target, spec_len = input_dict["target_tensors"][:3]
        T = dec["decoder_spec"].shape[1]
        spec = spec[:, :T]
        stop_target = stop_target[:, :T]
        if self._use_mask:
            mask = (jnp.arange(T)[None, :] <
                    spec_len[:, None]).astype(jnp.float32)
        else:
            mask = jnp.ones((spec.shape[0], T), jnp.float32)

        dec_loss = self._spec_loss(dec["decoder_spec"], spec, mask)
        post_loss = self._spec_loss(dec["post_net_spec"], spec, mask)

        stop_logits = dec["stop_token_logits"].astype(jnp.float32)
        stop_ce = jnp.maximum(stop_logits, 0) - \
            stop_logits * stop_target + \
            jnp.log1p(jnp.exp(-jnp.abs(stop_logits)))
        stop_loss = jnp.sum(stop_ce * mask) / jnp.maximum(jnp.sum(mask),
                                                          1.0)
        return dec_loss + post_loss + self._stop_w * stop_loss
