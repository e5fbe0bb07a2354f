"""Joint CTC + cross-entropy loss (reference
`open_seq2seq/losses/jca_loss.py:15-120`): lambda * CTC + (1-lambda) * CE
on the attention decoder's logits."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .loss import Loss
from ..ops.ctc import ctc_loss


class MultiTaskCTCEntropyLoss(Loss):

    @staticmethod
    def get_required_params():
        return dict(Loss.get_required_params(), **{
            "ctc_loss_params": dict,
            "seq_loss_params": dict,
            "lambda_value": float,
            "tgt_vocab_size": int,
            "batch_size": int,
        })

    def __init__(self, params, model, name="jca_loss"):
        super().__init__(params, model, name)
        self.lam = self._params["lambda_value"]

    def compute_loss(self, input_dict):
        dec = input_dict["decoder_output"]
        labels, label_lens = input_dict["target_tensors"][:2]

        ctc_out = dec["ctc_outputs"]
        # attention targets include GO/END; CTC targets drop them
        ctc_labels = labels[:, 1:]
        ctc_lens = jnp.maximum(label_lens - 2, 0)
        ctc = ctc_loss(ctc_out["logits"], ctc_out["src_length"],
                       ctc_labels, ctc_lens, average_across_batch=True)

        seq_out = dec["seq_outputs"]
        logits = seq_out["logits"].astype(jnp.float32)
        y = labels[:, 1:]
        y_len = label_lens - 1
        logits = logits[:, :y.shape[1], :]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        mask = (jnp.arange(y.shape[1])[None, :] <
                y_len[:, None]).astype(jnp.float32)
        ce = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        return self.lam * ctc + (1.0 - self.lam) * ce
