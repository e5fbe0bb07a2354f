from .decoder import Decoder
from .fc_decoders import (FullyConnectedDecoder, FullyConnectedTimeDecoder,
                          FullyConnectedCTCDecoder,
                          FullyConnectedSCDecoder)
from .transformer_decoder import TransformerDecoder
from .lm_decoders import FakeDecoder
from .tacotron2_decoder import Tacotron2Decoder
from .rnn_decoders import (RNNDecoderWithAttention,
                           BeamSearchRNNDecoderWithAttention)
from .convs2s_decoder import ConvS2SDecoder
from .las_decoder import ListenAttendSpellDecoder
from .jca_decoder import JointCTCAttentionDecoder
from .centaur_decoder import CentaurDecoder
from .transducer_decoder import TransducerDecoder
