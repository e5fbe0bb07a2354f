from .encoder import Encoder
from .tdnn_encoder import TDNNEncoder
from .transformer_encoder import TransformerEncoder
from .ds2_encoder import DeepSpeech2Encoder
from .resnet_encoder import ResNetEncoder
from .cnn_encoder import CNNEncoder
from .lm_encoders import LMEncoder
from .tacotron2_encoder import Tacotron2Encoder
from .rnn_encoders import (UnidirectionalRNNEncoderWithEmbedding,
                           BidirectionalRNNEncoderWithEmbedding,
                           GNMTLikeEncoderWithEmbedding,
                           GNMTLikeEncoderWithEmbedding_cuDNN)
from .wavenet_encoder import WavenetEncoder
from .convs2s_encoder import ConvS2SEncoder
from .las_encoder import ListenAttendSpellEncoder
from .centaur_encoder import CentaurEncoder
from .transformer_xl_encoder import TransformerXLEncoder
from .conformer_encoder import ConformerEncoder
from .gatedconv_encoder import GatedConvEncoder, GatedConvNet  # noqa: F401
