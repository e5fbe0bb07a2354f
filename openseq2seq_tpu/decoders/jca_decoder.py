"""Joint CTC-Attention decoder (reference
`open_seq2seq/decoders/jca_decoder.py:10-105`): runs a CTC head and an
attention decoder over the same encoder output; trained jointly via
``MultiTaskCTCEntropyLoss``, inference uses the attention outputs."""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from .decoder import Decoder


class JointCTCAttentionDecoder(Decoder):

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "ctc_decoder": None,
            "attn_decoder": None,
            "attn_decoder_params": dict,
            "ctc_decoder_params": dict,
            "beam_search_params": dict,
            "language_model_params": dict,
            "GO_SYMBOL": int,
            "END_SYMBOL": int,
            "tgt_vocab_size": int,
        })

    def __init__(self, params, model, name="jca_decoder", mode="train"):
        super().__init__(params, model, name, mode)
        p = self._params
        ctc_params = dict(p["ctc_decoder_params"])
        attn_params = dict(p["attn_decoder_params"])
        attn_params.update(p.get("beam_search_params", {}))
        attn_params.update(p.get("language_model_params", {}))
        # CTC head drops the GO/END symbols, attention keeps them
        # (reference `jca_decoder.py:66-70`)
        ctc_params["tgt_vocab_size"] = p["tgt_vocab_size"] - 1
        attn_params["tgt_vocab_size"] = p["tgt_vocab_size"]
        attn_params["GO_SYMBOL"] = p["GO_SYMBOL"]
        attn_params["END_SYMBOL"] = p["END_SYMBOL"]
        self.ctc_decoder = p["ctc_decoder"](params=ctc_params,
                                            model=model, mode=mode)
        self.attn_decoder = p["attn_decoder"](params=attn_params,
                                              model=model, mode=mode)

    def make_module(self):
        class JCADecoderModule(nn.Module):
            ctc: nn.Module
            attn: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                seq_out = self.attn(input_dict, train)
                ctc_out = self.ctc(input_dict, train)
                out = {"seq_outputs": seq_out, "ctc_outputs": ctc_out,
                       "src_length": seq_out.get(
                           "src_length",
                           input_dict["encoder_output"]["src_length"])}
                if "outputs" in seq_out:
                    out["outputs"] = seq_out["outputs"]
                if "logits" in seq_out:
                    out["logits"] = seq_out["logits"]
                return out

        return JCADecoderModule(ctc=self.ctc_decoder.make_module(),
                                attn=self.attn_decoder.make_module())
