"""CTC loss component (reference `open_seq2seq/losses/ctc_loss.py:19-90`).

Wraps :func:`openseq2seq_tpu.ops.ctc.ctc_loss`. The reference's CUDA
``tf.nn.ctc_loss`` semantics are preserved: fp32 computation regardless
of the model compute dtype, ``ignore_longer_outputs_than_inputs``
zeroing infeasible rows (instead of the reference's post-hoc NaN mask,
`ctc_loss.py:85-86` — ours never produces the NaN in the first place),
blank as the last class.
"""
from __future__ import annotations

from .loss import Loss
from ..ops.ctc import ctc_loss


class CTCLoss(Loss):

    @staticmethod
    def get_optional_params():
        return dict(Loss.get_optional_params(), **{
            "mask_nan": bool,
            "use_pallas": bool,   # run the alpha/beta recursions as
                                  # single Pallas kernels (TPU only)
        })

    def __init__(self, params, model, name="ctc_loss"):
        super().__init__(params, model, name)
        self._mask_nan = self._params.get("mask_nan", True)
        self._use_pallas = self._params.get("use_pallas", False)

    def compute_loss(self, input_dict):
        """input_dict:
          decoder_output: {"logits": (B, T, V) batch-major}
          target_tensors: [labels (B, L), label_lengths (B,)]
          decoder_output["src_length"]: (B,) logit lengths
        """
        logits = input_dict["decoder_output"]["logits"]
        logit_lengths = input_dict["decoder_output"]["src_length"]
        labels, label_lengths = input_dict["target_tensors"]
        if self._use_pallas:
            from ..ops.ctc_pallas import ctc_loss_pallas
            return ctc_loss_pallas(
                logits, logit_lengths, labels, label_lengths,
                blank_id=-1,
                ignore_longer_outputs_than_inputs=self._mask_nan,
                average_across_batch=True)
        return ctc_loss(logits, logit_lengths, labels, label_lengths,
                        blank_id=-1,
                        ignore_longer_outputs_than_inputs=self._mask_nan,
                        average_across_batch=True)
