from .common import (get_padding_bias, get_decoder_self_attention_bias,
                     get_position_encoding, SharedEmbedding, PreNormResidual)
from .attention import MultiHeadAttention
from .ffn import FeedForwardNetwork
