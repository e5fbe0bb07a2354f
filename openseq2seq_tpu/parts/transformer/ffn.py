"""Position-wise feed-forward network (reference
`open_seq2seq/parts/transformer/ffn_layer.py:24`)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class FeedForwardNetwork(nn.Module):
    hidden_size: int
    filter_size: int
    relu_dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.DenseGeneral(self.filter_size, dtype=self.dtype,
                            param_dtype=jnp.float32, name="filter")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(rate=self.relu_dropout, deterministic=not train)(x)
        return nn.DenseGeneral(self.hidden_size, dtype=self.dtype,
                               param_dtype=jnp.float32, name="output")(x)
