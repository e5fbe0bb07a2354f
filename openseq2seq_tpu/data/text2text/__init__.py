from .text2text import ParallelTextDataLayer, SpecialTextTokens
