"""Plain softmax cross-entropy for classification
(reference `open_seq2seq/losses/cross_entropy_loss.py:11`)."""
from __future__ import annotations

import jax.numpy as jnp
import optax

from .loss import Loss


class CrossEntropyLoss(Loss):

    def compute_loss(self, input_dict):
        logits = input_dict["decoder_output"]["logits"].astype(jnp.float32)
        labels = input_dict["target_tensors"][0]
        if labels.ndim == logits.ndim:  # one-hot
            losses = optax.softmax_cross_entropy(logits, labels)
        else:
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
        return jnp.mean(losses)
