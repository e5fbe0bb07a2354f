"""Position-wise feed-forward network (reference
`open_seq2seq/parts/transformer/ffn_layer.py:24`)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..dropout import Dropout
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
        from ...ops import dropout_pallas as dp
        from ..dropout import get_fused_dropout, relu_dropout
        if train and self.relu_dropout > 0.0:
            if (get_fused_dropout()
                    and dp.supported(x.shape,
                                     interpret=dp.FORCE_INTERPRET)):
                x = dp.fused_dropout(self.make_rng("dropout"),
                                     jax.nn.relu(x), self.relu_dropout,
                                     interpret=dp.FORCE_INTERPRET)
            else:
                # self-residualizing relu+dropout: no mask/sign
                # residual crosses the fwd/bwd boundary (parts/dropout
                # .relu_dropout) — the default since round 5
                x = relu_dropout(self.make_rng("dropout"),
                                 self.relu_dropout, x)
        else:
            x = jax.nn.relu(x)
        return nn.DenseGeneral(self.hidden_size, dtype=self.dtype,
                               param_dtype=jnp.float32, name="output")(x)


class MoEFeedForward(nn.Module):
    """Switch-style mixture-of-experts FFN (beyond reference parity —
    OpenSeq2Seq has no MoE): a learned router picks the top-1 expert per
    token; every expert FFN is evaluated and combined through the
    one-hot gate (dense dispatch — exact, no capacity drops, and the
    expert dimension shards cleanly over the mesh "model" axis for
    expert parallelism: see DEFAULT_TP_RULES "experts_" entries, each
    device computes only its experts and GSPMD psums the combine)."""
    hidden_size: int
    filter_size: int
    num_experts: int
    relu_dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        D, F, E = self.hidden_size, self.filter_size, self.num_experts
        init = nn.initializers.xavier_uniform()
        w1 = self.param("experts_w1", init, (E, D, F), jnp.float32)
        b1 = self.param("experts_b1", nn.initializers.zeros, (E, F),
                        jnp.float32)
        w2 = self.param("experts_w2", init, (E, F, D), jnp.float32)
        b2 = self.param("experts_b2", nn.initializers.zeros, (E, D),
                        jnp.float32)
        router = nn.DenseGeneral(E, use_bias=False, dtype=jnp.float32,
                                 param_dtype=jnp.float32,
                                 name="router")(x.astype(jnp.float32))
        gates = jax.nn.softmax(router, axis=-1)            # (B,T,E)
        top = jnp.argmax(gates, axis=-1)
        onehot = jax.nn.one_hot(top, E, dtype=jnp.float32)
        gate = jnp.sum(gates * onehot, axis=-1,
                       keepdims=True)                      # (B,T,1)

        xc = x.astype(self.dtype)
        h = jnp.einsum("btd,edf->betf", xc, w1.astype(self.dtype))
        h = jax.nn.relu(h + b1.astype(self.dtype)[None, :, None, :])
        h = Dropout(rate=self.relu_dropout,
                       deterministic=not train)(h)
        y = jnp.einsum("betf,efd->betd", h, w2.astype(self.dtype))
        y = y + b2.astype(self.dtype)[None, :, None, :]
        # combine: each token takes its top-1 expert's output, scaled
        # by the (differentiable) gate so the router gets gradients
        y = jnp.einsum("betd,bte->btd", y,
                       onehot.astype(self.dtype))
        out = y * gate.astype(self.dtype)
        # auxiliary load-balancing loss (Switch Transformer eq. 4);
        # returned for the encoder to surface and the model to add
        density = jnp.mean(onehot, axis=(0, 1))            # (E,)
        density_proxy = jnp.mean(gates, axis=(0, 1))
        aux = E * jnp.sum(density * density_proxy)
        return out, aux
