"""Transducer (RNN-T) loss component — beyond-parity; the reference's
ASR losses stop at CTC/attention-CE (`open_seq2seq/losses/`). Wraps
:func:`openseq2seq_tpu.ops.transducer.transducer_loss`; fp32 recursion
regardless of compute dtype, blank = last class (framework convention,
`losses/ctc_loss.py`).
"""
from __future__ import annotations

from .loss import Loss
from ..ops.transducer import transducer_loss


class TransducerLoss(Loss):

    def compute_loss(self, input_dict):
        """input_dict:
          decoder_output: {"logits": (B, T, U+1, V) joint lattice,
                           "src_length": (B,) encoder frames}
          target_tensors: [labels (B, U), label_lengths (B,)]
        """
        logits = input_dict["decoder_output"]["logits"]
        logit_lengths = input_dict["decoder_output"]["src_length"]
        labels, label_lengths = input_dict["target_tensors"]
        return transducer_loss(logits, logit_lengths, labels,
                               label_lengths, blank_id=-1,
                               average_across_batch=True)
