"""Listen-Attend-Spell decoder (reference
`open_seq2seq/decoders/las_decoder.py:22-399`): a character-level
attention speller — the same machinery as the NMT RNN attention decoder
with ASR naming. Provided as a named subclass for config parity."""
from __future__ import annotations

from .rnn_decoders import RNNDecoderWithAttention


class ListenAttendSpellDecoder(RNNDecoderWithAttention):
    pass
