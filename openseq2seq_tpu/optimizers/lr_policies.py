"""Learning-rate policies as jit-traceable schedules.

Functional parity with the reference's policy set
(`open_seq2seq/optimizers/lr_policies.py:16-245`): ``fixed_lr``,
``piecewise_constant``, ``exp_decay``, ``poly_decay``, ``cosine_decay``,
``transformer_policy`` (noam), ``inv_poly_decay`` — all with
warmup / begin_decay_at / min_lr options where the reference has them.

Each policy is a plain function of ``global_step`` (a traced int32/64
scalar) returning a float32 scalar, built with ``jnp.where`` so the whole
schedule lives inside the jitted train step (no host-side LR feeds).
``make_lr_schedule`` adapts a config dict into an optax-style schedule.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence

import jax.numpy as jnp


def fixed_lr(global_step, learning_rate: float):
    del global_step
    return jnp.float32(learning_rate)


def piecewise_constant(global_step, learning_rate: float,
                       boundaries: Sequence[int],
                       decay_rates: Sequence[float],
                       steps_per_epoch: Optional[int] = None):
    """LR is ``learning_rate * decay_rates[i]`` after ``boundaries[i]``.
    Boundaries are epochs when ``steps_per_epoch`` is given, else steps."""
    if steps_per_epoch is not None:
        boundaries = [b * steps_per_epoch for b in boundaries]
    step = global_step.astype(jnp.float32) if hasattr(global_step, "astype") \
        else jnp.float32(global_step)
    lr = jnp.float32(learning_rate)
    for boundary, rate in zip(boundaries, decay_rates):
        lr = jnp.where(step >= boundary, jnp.float32(learning_rate * rate), lr)
    return lr


def _warmup(lr, global_step, warmup_steps: int):
    if warmup_steps and warmup_steps > 0:
        step = jnp.asarray(global_step, jnp.float32)
        return jnp.where(step < warmup_steps, lr * step / warmup_steps, lr)
    return lr


def exp_decay(global_step, learning_rate: float, decay_steps: int,
              decay_rate: float, use_staircase_decay: bool,
              begin_decay_at: int = 0, min_lr: float = 0.0):
    step = jnp.asarray(global_step, jnp.float32)
    t = jnp.maximum(step - begin_decay_at, 0.0) / decay_steps
    if use_staircase_decay:
        t = jnp.floor(t)
    decayed = learning_rate * jnp.power(jnp.float32(decay_rate), t)
    lr = jnp.where(step < begin_decay_at, jnp.float32(learning_rate), decayed)
    return jnp.maximum(jnp.float32(min_lr), lr)


def poly_decay(global_step, learning_rate: float, decay_steps: int,
               power: float = 1.0, begin_decay_at: int = 0,
               min_lr: float = 0.0, warmup_steps: int = 0):
    step = jnp.asarray(global_step, jnp.float32)
    base = _warmup(jnp.float32(learning_rate), global_step, warmup_steps)
    frac = jnp.minimum(jnp.maximum(step - begin_decay_at, 0.0) / decay_steps, 1.0)
    decayed = (base - min_lr) * jnp.power(1.0 - frac, power) + min_lr
    return jnp.where(step < begin_decay_at, base, decayed)


def cosine_decay(global_step, learning_rate: float, decay_steps: int,
                 power: float = 1.0, begin_decay_at: int = 0,
                 min_lr: float = 0.0, warmup_steps: int = 0):
    del power  # accepted for config parity; unused (as in reference)
    step = jnp.asarray(global_step, jnp.float32)
    base = _warmup(jnp.float32(learning_rate), global_step, warmup_steps)
    frac = jnp.minimum(jnp.maximum(step - begin_decay_at, 0.0) / decay_steps, 1.0)
    # tf.train.cosine_decay semantics: alpha (=min_lr) is a *fraction* floor
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
    decayed = base * ((1.0 - min_lr) * cosine + min_lr)
    return jnp.where(step < begin_decay_at, base, decayed)


def transformer_policy(global_step, learning_rate: float, d_model: int,
                       warmup_steps: int, max_lr: Optional[float] = None,
                       coefficient: float = 1.0):
    """Noam decay with an optional hat (max_lr)."""
    step = jnp.asarray(global_step, jnp.float32) + 1.0
    ws = jnp.float32(warmup_steps)
    decay = coefficient * d_model ** -0.5 * jnp.minimum(
        step * ws ** -1.5, step ** -0.5)
    lr = decay * learning_rate
    if max_lr is not None:
        lr = jnp.minimum(jnp.float32(max_lr), lr)
    return lr


def inv_poly_decay(global_step, learning_rate: float, decay_steps: int,
                   min_lr: float, power: float = 1.0,
                   begin_decay_at: int = 0, warmup_steps: int = 0):
    """lr = lr0 / (1 + scale*t)^power with scale chosen so lr(decay_steps)
    == min_lr."""
    del begin_decay_at, warmup_steps  # parity: reference ignores them too
    if power <= 0.0:
        raise ValueError("Inv poly decay requires power > 0.")
    min_lr = min(max(min_lr, 1e-8), learning_rate)
    scale = (math.pow(learning_rate / min_lr, 1.0 / power) - 1.0) / decay_steps
    step = jnp.asarray(global_step, jnp.float32)
    denom = jnp.power(1.0 + scale * step, power)
    return jnp.float32(learning_rate) / denom


LR_POLICY_REGISTRY: Dict[str, Callable] = {
    "fixed_lr": fixed_lr,
    "fixed": fixed_lr,   # alias used by the lm/transfer recipes
    "piecewise_constant": piecewise_constant,
    "exp_decay": exp_decay,
    "poly_decay": poly_decay,
    "cosine_decay": cosine_decay,
    "transformer_policy": transformer_policy,
    "inv_poly_decay": inv_poly_decay,
}


def make_lr_schedule(lr_policy, lr_policy_params: Optional[Dict[str, Any]] = None
                     ) -> Callable:
    """Turn a config's ``lr_policy`` (callable or registry name) +
    ``lr_policy_params`` into an optax schedule ``step -> lr``."""
    if isinstance(lr_policy, str):
        if lr_policy not in LR_POLICY_REGISTRY:
            raise ValueError("Unknown lr_policy '{}'. Available: {}".format(
                lr_policy, sorted(LR_POLICY_REGISTRY)))
        lr_policy = LR_POLICY_REGISTRY[lr_policy]
    params = dict(lr_policy_params or {})

    def schedule(step):
        return lr_policy(step, **params)

    return schedule
