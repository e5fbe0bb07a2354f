"""Dropout with optionally cheap (8-bit) mask generation.

Measured motivation (one v5e chip, transformer-big): dropout mask
generation is the MFU ceiling of the training step — T=256/bs16 runs
at MFU 0.434 with dropout on vs 0.567 with dropout off even after the
round-2 ``prng_impl: "rbg"`` fix.  A Bernoulli mask only needs a few
bits of entropy per element, but ``jax.random.bernoulli`` draws a full
32-bit word and converts to float.  Requesting ``uint8`` bits from
XLA's RngBitGenerator quarters the generated bit volume and runs the
threshold compare at u8, at the cost of quantizing the keep
probability to a multiple of 1/256 (the mask is rescaled by the
*quantized* keep probability, so E[dropout(x)] == x stays exact).

The reference keeps dropout semantics fixed everywhere
(`tf.nn.dropout` in OpenSeq2Seq); this is a TPU-side throughput lever
with no reference counterpart, so it is opt-in: model param
``dropout_bits: 8`` (default 32 == exact flax/bernoulli behavior).

The setting is process-global (set once per model construction, read
at jit-trace time) because dropout call sites are spread across every
encoder/decoder module and threading a config through ~30 flax module
trees would distort their public attributes.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_DROPOUT_BITS = 32


def set_dropout_bits(bits) -> None:
    """Select mask-generation width: 32 (exact bernoulli) or 8."""
    global _DROPOUT_BITS
    if bits in (None, 32):
        _DROPOUT_BITS = 32
    elif bits == 8:
        _DROPOUT_BITS = 8
    else:
        raise ValueError(
            f"dropout_bits must be 8 or 32 (None), got {bits!r}")


def get_dropout_bits() -> int:
    return _DROPOUT_BITS


class Dropout(nn.Dropout):
    """Drop-in ``nn.Dropout`` honoring ``set_dropout_bits``.

    Identical to flax's layer (same rng collection, broadcast_dims,
    deterministic merge) — with ``dropout_bits == 8`` the Bernoulli
    draw is replaced by a u8 threshold compare.
    """

    @nn.compact
    def __call__(self, inputs, deterministic=None, rng=None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic)
        if (self.rate == 0.0) or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)

        keep_prob = 1.0 - self.rate
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        broadcast_shape = list(inputs.shape)
        for dim in self.broadcast_dims:
            broadcast_shape[dim] = 1

        if _DROPOUT_BITS == 8:
            # quantized threshold: keep iff bits < t, P = t/256
            t = min(255, max(1, int(round(keep_prob * 256.0))))
            q = t / 256.0
            bits = jax.random.bits(rng, tuple(broadcast_shape),
                                   jnp.uint8)
            mask = jnp.broadcast_to(bits < jnp.uint8(t), inputs.shape)
            return lax.select(mask, inputs / q, jnp.zeros_like(inputs))
        # bit-identical to flax nn.Dropout
        mask = jax.random.bernoulli(rng, p=keep_prob,
                                    shape=broadcast_shape)
        mask = jnp.broadcast_to(mask, inputs.shape)
        return lax.select(mask, inputs / keep_prob,
                          jnp.zeros_like(inputs))
