"""Transducer (RNN-T) loss component — beyond-parity; the reference's
ASR losses stop at CTC/attention-CE (`open_seq2seq/losses/`). Wraps
:func:`openseq2seq_tpu.ops.transducer.transducer_loss`; fp32 recursion
regardless of compute dtype, blank = last class (framework convention,
`losses/ctc_loss.py`).
"""
from __future__ import annotations

from .loss import Loss
from ..ops.transducer import transducer_loss, transducer_loss_fused


class TransducerLoss(Loss):

    @staticmethod
    def get_optional_params():
        return dict(Loss.get_optional_params(), **{
            "fused_block_size": int,   # anti-diagonals per fused-loss
                                       # scan step (default 8)
            "fastemit_lambda": float,  # FastEmit (arXiv:2010.11148)
                                       # emission-gradient scale for
                                       # low-latency streaming; 0 = off
        })

    def compute_loss(self, input_dict):
        """input_dict:
          decoder_output: {"logits": (B, T, U+1, V) joint lattice,
                           "src_length": (B,) encoder frames} — or, with
            ``decoder_params: {"fused_loss": true}``, a "joint_fused"
            dict of pre-projection activations consumed by the
            diagonal-fused loss (no materialized lattice).
          target_tensors: [labels (B, U), label_lengths (B,)]
        """
        dec = input_dict["decoder_output"]
        logit_lengths = dec["src_length"]
        labels, label_lengths = input_dict["target_tensors"]
        fused = dec.get("joint_fused")
        lam = float(self._params.get("fastemit_lambda", 0.0))
        if fused is not None:
            return transducer_loss_fused(
                fused["enc_j"], fused["pred_j"], fused["joint_b"],
                fused["out_w"], fused["out_b"], logit_lengths, labels,
                label_lengths, blank_id=-1, average_across_batch=True,
                block_size=self._params.get("fused_block_size", 8),
                fastemit_lambda=lam)
        return transducer_loss(dec["logits"], logit_lengths, labels,
                               label_lengths, blank_id=-1,
                               average_across_batch=True,
                               fastemit_lambda=lam)
