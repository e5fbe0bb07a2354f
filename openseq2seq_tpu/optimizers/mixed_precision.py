"""Mixed-precision policy — the TPU-native replacement for the reference's
``MixedPrecisionOptimizerWrapper`` (`open_seq2seq/optimizers/mp_wrapper.py:
27-146`).

The reference keeps fp16 compute copies of every variable plus fp32
"master" copies updated by the optimizer. On TPU the idiomatic design
inverts this: parameters *live* in fp32 (single source of truth held by
the optimizer/train state) and are cast to the compute dtype at use, so
there is no copy-back, no variable duplication, and checkpoints hold one
set of weights. The config key ``dtype`` keeps the reference's values:

  * ``"float32"``                — fp32 everywhere;
  * ``"mixed"``                  — fp32 params, bf16 compute (TPU default;
                                   no loss scaling needed — bf16 has fp32's
                                   exponent range);
  * ``"float16"`` / ``"mixed_fp16"`` — fp32 params, fp16 compute with
                                   automatic loss scaling (parity mode for
                                   the reference's GPU recipe);
  * ``"bfloat16"``               — bf16 params and compute (pure bf16).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MixedPrecisionPolicy:
    param_dtype: Any
    compute_dtype: Any
    output_dtype: Any        # dtype losses are computed in (always fp32)
    use_loss_scaling: bool

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def cast_to_param(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


_POLICIES = {
    "float32": MixedPrecisionPolicy(jnp.float32, jnp.float32, jnp.float32, False),
    "mixed": MixedPrecisionPolicy(jnp.float32, jnp.bfloat16, jnp.float32, False),
    "bfloat16": MixedPrecisionPolicy(jnp.bfloat16, jnp.bfloat16, jnp.float32, False),
    "float16": MixedPrecisionPolicy(jnp.float32, jnp.float16, jnp.float32, True),
    "mixed_fp16": MixedPrecisionPolicy(jnp.float32, jnp.float16, jnp.float32, True),
}


def get_mp_policy(dtype: Optional[Any]) -> MixedPrecisionPolicy:
    """Resolve a config ``dtype`` value (string, jnp dtype, or None)."""
    if dtype is None:
        return _POLICIES["float32"]
    if isinstance(dtype, str):
        if dtype not in _POLICIES:
            raise ValueError("Unknown dtype policy '{}'. Available: {}"
                             .format(dtype, sorted(_POLICIES)))
        return _POLICIES[dtype]
    # a raw jnp dtype: use it for both params and compute
    jdt = jnp.dtype(dtype)
    if jdt == jnp.float32:
        return _POLICIES["float32"]
    if jdt == jnp.bfloat16:
        return _POLICIES["bfloat16"]
    if jdt == jnp.float16:
        return _POLICIES["float16"]
    raise ValueError("Unsupported dtype policy: {}".format(dtype))
