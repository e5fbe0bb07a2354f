"""WaveNet loss: sparse softmax CE over mu-law classes, masked by audio
length (reference `open_seq2seq/losses/wavenet_loss.py:7-44`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .loss import Loss


class WavenetLoss(Loss):

    def compute_loss(self, input_dict):
        dec = input_dict["decoder_output"]
        logits = dec["logits"].astype(jnp.float32)      # (B, T, Q)
        labels = dec["labels"]                          # (B, T)
        lengths = dec.get("audio_len")
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        if lengths is not None:
            mask = (jnp.arange(labels.shape[1])[None, :] <
                    lengths[:, None]).astype(jnp.float32)
        else:
            mask = jnp.ones_like(nll)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
