"""Shared benchmark timing helpers.

The axon-relayed TPU adds ~150 ms - 1 s of per-dispatch latency, so
per-dispatch timing loops (`bench.py`-style) are only valid for steps
well above that (Jasper bs128 is ~760 ms/step). For fast steps
(ResNet ~40 ms, LSTM-LM, Tacotron) the relay dominates and the loop
measures the network, not the chip — chain K train steps inside ONE
jitted program (`lax.fori_loop`) and time a few back-to-back program
launches instead.

Relies on the TrainState pytree being stable across ``train_step``
(guaranteed since `models/model.py` keeps ``model_state`` a plain
dict) so the step can be a loop body.
"""
from __future__ import annotations

import functools
import math
import time
from typing import Any, Tuple


def make_multi_step(model, k: int):
    """One jitted program running ``k`` chained train steps.

    Returns ``(new_state, last_loss)``; the per-iteration dropout rng is
    ``fold_in(rng, i)`` so steps are not bit-identical (XLA cannot CSE
    the chain away).
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch, rng):
        def body(i, carry):
            st, _ = carry
            st, m = model.train_step(st, batch,
                                     jax.random.fold_in(rng, i))
            return (st, m["loss"])
        return jax.lax.fori_loop(0, k, body,
                                 (state, jnp.float32(0.0)))

    return multi_step


def time_chained_steps(model, state, batch, rng,
                       chain: int = 20,
                       calls: int = 3) -> Tuple[float, int, Any]:
    """Time ``calls`` launches of a ``chain``-step program.

    Returns ``(wall_seconds, total_steps, final_state)``. Syncs with a
    scalar ``device_get`` — on experimental remote backends
    ``block_until_ready`` may not actually block.
    """
    import jax

    fn = make_multi_step(model, chain)
    state, loss = fn(state, batch, rng)        # warmup / compile
    float(jax.device_get(loss))

    t0 = time.time()
    for _ in range(calls):
        state, loss = fn(state, batch, rng)
    final_loss = float(jax.device_get(loss))
    wall = time.time() - t0
    # a bench number over a diverged/NaN step is not a number: fail
    # loudly instead of printing a throughput for garbage math
    if not math.isfinite(final_loss):
        raise AssertionError(
            "non-finite loss after {} benchmarked steps: {}".format(
                chain * calls, final_loss))
    return wall, chain * calls, state


def train_step_flops(model, state, batch, rng) -> float:
    """Per-step model FLOPs from XLA's compiled cost analysis
    (0.0 if the backend does not report them)."""
    import jax

    try:
        cost = jax.jit(model.train_step).lower(
            state, batch, rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0
