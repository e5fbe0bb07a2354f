#!/usr/bin/env python
"""One-shot numerical validation of the separable-fold flash rel-pos
attention ON REAL TPU (interpret-mode equivalence is covered by
tests/test_flash_relpos.py; this checks the Mosaic-lowered kernels):
runs RelPosSelfAttention with and without ``use_flash`` on the same
params/input and reports max |diff| of outputs and of param grads.

Usage: python scripts/validate_flash_tpu.py [B T D H]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402


def main():
    from openseq2seq_tpu.encoders.conformer_encoder import \
        RelPosSelfAttention
    args = [int(a) for a in sys.argv[1:]]
    B, T, D, H = (args + [8, 250, 256, 4][len(args):])[:4]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = np.full((B,), T)
    lengths[1:] = rng.randint(T // 2, T, size=B - 1)
    pad_mask = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    mask_f = pad_mask[..., None].astype(jnp.float32)

    plain = RelPosSelfAttention(num_heads=H, dropout=0.0)
    flash = RelPosSelfAttention(num_heads=H, dropout=0.0,
                                use_flash=True)
    params = plain.init(jax.random.PRNGKey(0), x, pad_mask, False)

    def loss(p, mod):
        return jnp.sum((mod.apply(p, x, pad_mask, False) * mask_f) ** 2)

    o1 = jax.jit(lambda p: plain.apply(p, x, pad_mask, False))(params)
    o2 = jax.jit(lambda p: flash.apply(p, x, pad_mask, False))(params)
    od = float(jnp.max(jnp.abs((o1 - o2) * mask_f)))
    oscale = float(jnp.max(jnp.abs(o1)))
    print("output max|diff| = {:.3e} (scale {:.3e})".format(od, oscale),
          flush=True)

    g1 = jax.jit(jax.grad(lambda p: loss(p, plain)))(params)
    g2 = jax.jit(jax.grad(lambda p: loss(p, flash)))(params)
    worst = 0.0
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-12
        rel = d / s
        worst = max(worst, rel)
        print("  {:40s} max|dg| {:.3e} rel {:.3e}".format(
            jax.tree_util.keystr(path), d, rel), flush=True)
    ok = od / (oscale + 1e-12) < 5e-3 and worst < 5e-2
    print("VALIDATE_FLASH_TPU", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
