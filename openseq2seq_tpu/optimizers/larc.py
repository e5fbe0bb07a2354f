"""LARC (Layer-wise Adaptive Rate Clipping/Scaling) as an optax transform.

Parity with the reference's post-clip LARC branch
(`open_seq2seq/optimizers/optimizers.py:332-377`):

  clip mode:  g *= min(max(eta * ||w|| / (lr * (||g|| + eps)), min_update), 1)
  scale mode: g *= max(eta * ||w|| / (||g|| + eps), min_update)

Applied per parameter leaf *before* the optimizer update (the reference
applies it to raw gradients after global-norm clipping). Clip mode needs
the current learning rate, so the transform takes the LR schedule.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Union

import chex
import jax
import jax.numpy as jnp
import optax


class LARCState(NamedTuple):
    count: chex.Array


def larc(larc_eta: float,
         larc_mode: str = "clip",
         min_update: float = 1e-7,
         epsilon: float = 1e-7,
         learning_rate: Union[float, Callable, None] = None
         ) -> optax.GradientTransformation:
    if larc_mode not in ("clip", "scale"):
        raise ValueError("larc_mode has to be 'clip' or 'scale'")
    if larc_mode == "clip" and learning_rate is None:
        raise ValueError("LARC clip mode requires the learning rate/schedule")

    def init_fn(params):
        del params
        return LARCState(count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("LARC requires params")
        if callable(learning_rate):
            lr = learning_rate(state.count)
        else:
            lr = learning_rate

        def rescale(g, w):
            w_norm = jnp.linalg.norm(w.astype(jnp.float32))
            g_norm = jnp.linalg.norm(g.astype(jnp.float32))
            if larc_mode == "clip":
                update = jnp.maximum(
                    larc_eta * w_norm / (lr * (g_norm + epsilon)), min_update)
                update = jnp.minimum(update, 1.0)
            else:
                update = jnp.maximum(
                    larc_eta * w_norm / (g_norm + epsilon), min_update)
            return (g.astype(jnp.float32) * update).astype(g.dtype)

        updates = jax.tree_util.tree_map(rescale, updates, params)
        return updates, LARCState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
