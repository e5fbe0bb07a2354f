"""Pass-through decoder for models whose encoder already emits logits
(LM, WaveNet) — reference `open_seq2seq/decoders/lm_decoders.py:16-50`."""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from .decoder import Decoder


class FakeDecoder(Decoder):

    def make_module(self):
        class FakeDecoderModule(nn.Module):
            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                # forward everything the encoder produced
                return dict(input_dict["encoder_output"])

        return FakeDecoderModule()
