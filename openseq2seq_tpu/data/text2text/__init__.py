from .text2text import ParallelTextDataLayer, SpecialTextTokens
from .text2text import TransformerDataLayer
from .tokenizer import Subtokenizer
from .wordpiece import WordpieceSubtokenizer
