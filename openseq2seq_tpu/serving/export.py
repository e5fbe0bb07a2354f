"""Serving export — the TPU-native replacement for the reference's
TF-TRT path (`open_seq2seq/models/model.py:559-696`).

On GPU the reference freezes the graph and hands it to TensorRT for
engine compilation. On TPU the jitted forward *is* the compiled engine;
what serving needs is an ahead-of-time, weights-baked, versioned
artifact. ``export_inference_fn`` serializes the model's eval step
(with parameters captured as constants) to portable StableHLO via
``jax.export``; ``load_exported`` rehydrates it into a callable that
runs on any JAX backend of the same or newer version — no Python model
code needed at serving time.

INT8 (the TF-TRT extra) lives in ``serving/quantize.py``: weight-only
int8 export with per-channel scales plus TF-TRT-style activation-range
calibration.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
from jax import export as jax_export


def export_inference_fn(model, state, example_batch: Dict[str, Any],
                        path: str | None = None) -> bytes:
    """Serialize ``model.eval_step`` with ``state`` baked in.

    Returns the serialized bytes (and writes them to ``path`` if given).
    The exported function takes only the batch pytree.
    """
    params = jax.device_get(state.params)
    model_state = jax.device_get(state.model_state)

    def serve(batch):
        variables = {"params": params, **model_state}
        outputs = model.module().apply(
            variables, batch, train=False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        return outputs

    args = (jax.device_get(example_batch),)
    exported = jax_export.export(jax.jit(serve))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob_or_path) -> Callable:
    """Load a serialized artifact into a jittable callable(batch)."""
    if isinstance(blob_or_path, (str, bytes)) and not isinstance(
            blob_or_path, bytes):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    exported = jax_export.deserialize(blob)
    return jax.jit(functools.partial(exported.call))
