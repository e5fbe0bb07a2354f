"""Post-training INT8 quantization — the TPU-native counterpart of the
reference's TF-TRT INT8 calibration (`open_seq2seq/models/model.py:
559-696`, which builds a calibration graph, feeds data to collect
ranges, then freezes an int8 engine).

The TPU serving equivalent has two independent pieces:

  * **Weight-only INT8** (`quantize_params_int8` / `dequantize_params`):
    every matmul/conv kernel is stored as int8 with a per-output-channel
    fp32 scale (symmetric absmax quantization). At serving time the
    kernel is dequantized on the fly — weights at rest and in HBM are
    half the bf16 footprint, and the dequant fuses into the producing
    op. `export_inference_fn_int8` bakes the int8 weights into the
    StableHLO artifact so the *exported blob* shrinks ~2-4x.

  * **Activation calibration** (`calibrate_activations`): runs batches
    through the model with flax's ``capture_intermediates`` and records
    the per-layer absolute-max activation ranges — the same statistic
    TF-TRT's calibrator collects — as a plain dict for an int8x int8
    compute pass.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_QUANT_PATTERN = r"(kernel|embedding)$"
_SKIP_NDIM = 1          # biases / norms stay fp32


def _path_str(path) -> str:
    parts = []
    for k in path:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def quantize_params_int8(params, pattern: str = DEFAULT_QUANT_PATTERN,
                         min_size: int = 4096):
    """Symmetric per-output-channel int8 quantization of matching
    kernels. Returns (qparams, report): ``qparams`` mirrors ``params``
    but each quantized leaf becomes ``{"int8": int8 array, "scale":
    fp32 per-last-dim-channel scales}``; ``report`` maps quantized leaf
    paths to their max abs quantization error."""
    rx = re.compile(pattern)
    report = {}

    def q(path, leaf):
        name = _path_str(path)
        arr = np.asarray(leaf)
        if (not rx.search(name) or arr.ndim <= _SKIP_NDIM or
                arr.size < min_size or
                not np.issubdtype(arr.dtype, np.floating)):
            return leaf
        scale = np.max(np.abs(arr), axis=tuple(range(arr.ndim - 1)),
                       keepdims=True) / 127.0
        scale = np.maximum(scale, 1e-12).astype(np.float32)
        q8 = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        report[name] = float(np.max(np.abs(q8 * scale - arr)))
        return {"int8": q8, "scale": scale}

    qparams = jax.tree_util.tree_map_with_path(
        q, params, is_leaf=lambda x: hasattr(x, "ndim"))
    return qparams, report


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and set(x) == {"int8", "scale"}


def dequantize_params(qparams, dtype=jnp.float32):
    """Inverse of ``quantize_params_int8`` (lossy): int8 * scale."""
    def dq(leaf):
        if _is_qleaf(leaf):
            return (jnp.asarray(leaf["int8"], dtype) *
                    jnp.asarray(leaf["scale"], dtype))
        return leaf

    return jax.tree_util.tree_map(dq, qparams, is_leaf=_is_qleaf)


def _flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = prefix + "/" + str(k) if prefix else str(k)
        if isinstance(v, dict) and not _is_qleaf(v):
            out.update(_flatten_tree(v, key))
        elif _is_qleaf(v):
            out[key + "#int8"] = np.asarray(v["int8"])
            out[key + "#scale"] = np.asarray(v["scale"])
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_tree(flat):
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        last = parts[-1]
        if last.endswith("#int8"):
            node.setdefault(last[:-5], {})["int8"] = arr
        elif last.endswith("#scale"):
            node.setdefault(last[:-6], {})["scale"] = arr
        else:
            node[last] = arr
    return tree


def export_inference_fn_int8(model, state, example_batch,
                             path: str | None = None,
                             pattern: str = DEFAULT_QUANT_PATTERN,
                             min_size: int = 4096,
                             act_ranges: Dict[str, float] | None = None):
    """Like ``export.export_inference_fn`` but with int8 weights.

    A closed-over constant gets eagerly dequantized during tracing (ops
    on concrete arrays inside jit are not staged), which would bake
    fp32 weights right back into the program. So the exported program
    takes the quantized params as an *argument* — dequantization is
    staged and XLA fuses it into each kernel's first consumer — and the
    single artifact file carries {program, int8 weights, scales} in one
    npz container. Returns (blob_bytes, report).

    ``act_ranges``: per-Dense input absmax from
    `int8_exec.calibrate_dense_inputs`. When given, calibrated Dense
    layers execute as int8 x int8 -> int32 MXU matmuls in the exported
    program (activations quantized on the fly against the static
    ranges) — the TF-TRT INT8-engine equivalent."""
    import io
    from jax import export as jax_export

    qparams, report = quantize_params_int8(
        jax.device_get(state.params), pattern, min_size=min_size)
    model_state = jax.device_get(state.model_state)

    if act_ranges:
        from .int8_exec import make_int8_interceptor
        import flax.linen as nn

        def serve(qp, batch):
            interceptor = make_int8_interceptor(act_ranges, qparams=qp)
            with nn.intercept_methods(interceptor):
                variables = {"params": dequantize_params(qp),
                             **model_state}
                return model.module().apply(
                    variables, batch, train=False,
                    rngs={"dropout": jax.random.PRNGKey(0)})
    else:
        def serve(qp, batch):
            variables = {"params": dequantize_params(qp), **model_state}
            return model.module().apply(
                variables, batch, train=False,
                rngs={"dropout": jax.random.PRNGKey(0)})

    exported = jax_export.export(jax.jit(serve))(
        qparams, jax.device_get(example_batch))
    flat = _flatten_tree(qparams)
    buf = io.BytesIO()
    np.savez(buf, __program__=np.frombuffer(
        exported.serialize(), np.uint8), **flat)
    blob = buf.getvalue()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob, report


def load_exported_int8(blob_or_path) -> Callable:
    """Rehydrate an int8 artifact into a jittable ``callable(batch)``."""
    import functools
    import io
    from jax import export as jax_export

    if isinstance(blob_or_path, bytes):
        src = io.BytesIO(blob_or_path)
    else:
        src = blob_or_path
    with np.load(src) as z:
        program = z["__program__"].tobytes()
        flat = {k: z[k] for k in z.files if k != "__program__"}
    qparams = _unflatten_tree(flat)
    exported = jax_export.deserialize(bytearray(program))
    call = jax.jit(functools.partial(exported.call))
    return lambda batch: call(qparams, batch)


def calibrate_activations(model, state, batches: Iterable,
                          filter_fn: Callable[[str], bool] = None
                          ) -> Dict[str, float]:
    """Collect per-layer absolute-max activation ranges over calibration
    batches (the statistic TF-TRT's INT8 calibrator gathers). Returns
    {module_path: absmax} for every captured intermediate output."""
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.model_state)}
    ranges: Dict[str, float] = {}
    for batch in batches:
        _, mods = model.module().apply(
            variables, batch, train=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
            capture_intermediates=True, mutable=["intermediates"])

        def record(path, leaf):
            if hasattr(leaf, "ndim") and np.issubdtype(
                    np.asarray(leaf).dtype, np.floating):
                name = _path_str(path)
                if filter_fn is None or filter_fn(name):
                    mx = float(np.max(np.abs(np.asarray(leaf))))
                    ranges[name] = max(ranges.get(name, 0.0), mx)
            return leaf

        jax.tree_util.tree_map_with_path(
            record, mods["intermediates"])
    return ranges
