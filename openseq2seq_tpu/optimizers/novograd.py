"""NovoGrad optimizer as an optax gradient transformation.

Layer-wise second-moment normalized momentum with decoupled weight decay
and optional gradient averaging — the update rule of the reference's
``NovoGrad`` (`open_seq2seq/optimizers/novograd.py:30-126`):

    v_t   = beta2 * v_{t-1} + (1 - beta2) * ||g_t||^2     (per layer/leaf)
    v_0   = ||g_0||^2                                       (first step)
    ghat  = g_t / sqrt(v_t + eps) + wd * w_{t-1}
    ghat *= (1 - beta1)          if grad_averaging
    m_t   = beta1 * m_{t-1} + ghat
    w_t   = w_{t-1} - lr * m_t

The transformation outputs ``m_t`` (to be scaled by -lr downstream via
``optax.scale_by_learning_rate``-style chaining).
"""
from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class ScaleByNovoGradState(NamedTuple):
    count: chex.Array      # int32 step counter
    moments: optax.Updates  # first moment, per leaf
    grads_ema: optax.Updates  # scalar per leaf: EMA of ||g||^2


def scale_by_novograd(beta1: float = 0.95,
                      beta2: float = 0.98,
                      epsilon: float = 1e-8,
                      weight_decay: float = 0.0,
                      grad_averaging: bool = False,
                      moments_dtype=None) -> optax.GradientTransformation:
    """``moments_dtype`` (e.g. ``jnp.bfloat16``) stores the first-moment
    buffer in a reduced precision — halves optimizer HBM (the moment is
    a smoothed average, bf16's 8 mantissa bits cost <0.4% update error;
    the scalar per-layer second moments stay fp32)."""
    if isinstance(moments_dtype, str):
        moments_dtype = jnp.dtype(moments_dtype)

    def init_fn(params):
        moments = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, moments_dtype or p.dtype), params)
        grads_ema = jax.tree_util.tree_map(
            lambda p: jnp.zeros((), jnp.float32), params)
        return ScaleByNovoGradState(count=jnp.zeros((), jnp.int32),
                                    moments=moments, grads_ema=grads_ema)

    def update_fn(updates, state, params=None):
        if weight_decay > 0.0 and params is None:
            raise ValueError("NovoGrad with weight_decay requires params")

        def new_v(g, v):
            g2 = jnp.sum(jnp.square(g.astype(jnp.float32)))
            return jnp.where(state.count == 0, g2,
                             v * beta2 + g2 * (1.0 - beta2))

        grads_ema = jax.tree_util.tree_map(new_v, updates, state.grads_ema)

        def new_m(g, v, m, p):
            ghat = g.astype(jnp.float32) * jax.lax.rsqrt(v + epsilon)
            if weight_decay > 0.0:
                ghat = ghat + weight_decay * p.astype(jnp.float32)
            if grad_averaging:
                ghat = ghat * (1.0 - beta1)
            return beta1 * m.astype(jnp.float32) + ghat

        if params is None:
            params = jax.tree_util.tree_map(lambda g: None, updates)
        # fp32 moment is both the applied update and (cast) the carried
        # state — with moments_dtype=bf16 only the *storage* is rounded;
        # the parameter delta itself stays full precision
        moments_f32 = jax.tree_util.tree_map(new_m, updates, grads_ema,
                                             state.moments, params)
        moments = jax.tree_util.tree_map(
            lambda mn, mo: mn.astype(mo.dtype), moments_f32, state.moments)
        new_state = ScaleByNovoGradState(count=state.count + 1,
                                         moments=moments,
                                         grads_ema=grads_ema)
        return moments_f32, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def novograd(learning_rate, beta1: float = 0.95, beta2: float = 0.98,
             epsilon: float = 1e-8, weight_decay: float = 0.0,
             grad_averaging: bool = False) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_novograd(beta1=beta1, beta2=beta2, epsilon=epsilon,
                          weight_decay=weight_decay,
                          grad_averaging=grad_averaging),
        optax.scale_by_learning_rate(learning_rate),
    )
