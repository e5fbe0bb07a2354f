"""Automatic loss scaling for fp16 training — functional, jit-friendly.

TPU training defaults to bf16 compute (no scaler needed), but the
``dtype: "mixed"``-with-fp16 compatibility path keeps the reference's two
algorithms (`open_seq2seq/optimizers/automatic_loss_scaler.py:11-203`):

  * Backoff: divide scale by ``step_factor`` on overflow; multiply every
    ``step_window`` clean steps (window counted since last overflow).
  * LogMax: model log2(amax) with fast/slow EMAs; pick the scale that puts
    the (mu + k*sigma) quantile at 2^16.

State is a pytree carried in the train state; ``update`` is pure. The
train step should *skip the parameter update* when ``overflow`` is true —
mirroring the reference's skip-on-NaN behavior
(`optimizers/mp_wrapper.py:114-120`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import chex
import jax
import jax.numpy as jnp


class LossScaleState(NamedTuple):
    scale: chex.Array                 # float32 current loss scale
    iteration: chex.Array             # int32
    last_overflow_iteration: chex.Array  # int32 (backoff)
    x_hat: chex.Array                 # float32 (logmax fast EMA)
    slow_x_hat: chex.Array            # float32 (logmax slow EMA)
    xsquared_hat: chex.Array          # float32 (logmax slow EMA of x^2)
    b1_correction: chex.Array         # float32 bias-correction products
    b2_correction: chex.Array


def check_grads(grads) -> Tuple[chex.Array, chex.Array]:
    """Return (has_nonfinite, amax) over a gradient pytree."""
    leaves = jax.tree_util.tree_leaves(grads)
    has_nan = jnp.any(jnp.stack(
        [jnp.any(~jnp.isfinite(g.astype(jnp.float32))) for g in leaves]))
    amax = jnp.max(jnp.stack(
        [jnp.max(jnp.abs(g.astype(jnp.float32))) for g in leaves]))
    return has_nan, amax


class AutomaticLossScaler:
    """Config-compatible factory: ``AutomaticLossScaler("Backoff", params)``."""

    SUPPORTED_ALGOS = ("backoff", "logmax")

    def __init__(self, algorithm: str = "Backoff", params: Optional[dict] = None):
        algorithm = algorithm.lower().strip()
        if algorithm not in self.SUPPORTED_ALGOS:
            raise ValueError("Unknown scaling algorithm: {}".format(algorithm))
        self.algorithm = algorithm
        params = dict(params or {})
        self.scale_min = float(params.pop("scale_min", 1.0))
        self.scale_max = float(params.pop("scale_max", 2.0 ** 14))
        if algorithm == "backoff":
            self.step_factor = float(params.pop("step_factor", 2.0))
            self.step_window = int(params.pop("step_window", 2000))
        else:
            self.log_max = float(params.pop("log_max", 16.0))
            self.beta1 = float(params.pop("beta1", 0.99))
            self.beta2 = float(params.pop("beta2", 0.999))
            self.overflow_std_dev = float(params.pop("overflow_std_dev", 3.09))
        if params:
            raise ValueError("Unknown loss scaler params: {}".format(sorted(params)))

    def init(self) -> LossScaleState:
        init_scale = self.scale_max if self.algorithm == "backoff" else 1.0
        z = jnp.zeros((), jnp.float32)
        return LossScaleState(
            scale=jnp.float32(init_scale),
            iteration=jnp.zeros((), jnp.int32),
            last_overflow_iteration=-jnp.ones((), jnp.int32),
            x_hat=z, slow_x_hat=z, xsquared_hat=z,
            b1_correction=jnp.ones((), jnp.float32),
            b2_correction=jnp.ones((), jnp.float32))

    def update(self, state: LossScaleState, has_nan: chex.Array,
               amax: chex.Array) -> LossScaleState:
        overflow = jnp.logical_or(has_nan, ~jnp.isfinite(amax))
        if self.algorithm == "backoff":
            return self._backoff_update(state, overflow)
        return self._logmax_update(state, overflow, amax)

    def _backoff_update(self, state, overflow):
        down = jnp.clip(state.scale / self.step_factor,
                        self.scale_min, self.scale_max)
        since = state.iteration - state.last_overflow_iteration
        grow = jnp.equal(jnp.mod(since, self.step_window), 0)
        up = jnp.where(grow,
                       jnp.clip(state.scale * self.step_factor,
                                self.scale_min, self.scale_max),
                       state.scale)
        new_scale = jnp.where(overflow, down, up)
        new_last = jnp.where(overflow, state.iteration,
                             state.last_overflow_iteration)
        return state._replace(scale=new_scale,
                              iteration=state.iteration + 1,
                              last_overflow_iteration=new_last)

    def _logmax_update(self, state, overflow, amax):
        x = jnp.where(overflow, jnp.float32(2.0 ** self.log_max),
                      jnp.log2(jnp.maximum(amax, 1e-30)))
        x_hat = self.beta1 * state.x_hat + (1 - self.beta1) * x
        b1c = state.b1_correction * self.beta1
        mu = x_hat / (1 - b1c)
        slow_x_hat = self.beta2 * state.slow_x_hat + (1 - self.beta2) * x
        xsq_hat = self.beta2 * state.xsquared_hat + (1 - self.beta2) * x * x
        b2c = state.b2_correction * self.beta2
        e_xsq = xsq_hat / (1 - b2c)
        slow_mu = slow_x_hat / (1 - b2c)
        sigma = jnp.sqrt(jnp.maximum(e_xsq - slow_mu * slow_mu, 0.0))
        log_cutoff = sigma * self.overflow_std_dev + mu
        proposed = jnp.exp2(16.0 - log_cutoff)
        new_scale = jnp.clip(proposed, self.scale_min, self.scale_max)
        return state._replace(scale=new_scale,
                              iteration=state.iteration + 1,
                              x_hat=x_hat, slow_x_hat=slow_x_hat,
                              xsquared_hat=xsq_hat,
                              b1_correction=b1c, b2_correction=b2c)
