"""Validate the fused Pallas CTC kernels on real TPU hardware against
the XLA-scan reference (values + grads), then time them at bench shapes.

Run with the default (axon TPU) env. One jitted program per phase to
bound remote-compile time; prints flush immediately.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from openseq2seq_tpu.ops.ctc import ctc_loss
from openseq2seq_tpu.ops.ctc_pallas import ctc_loss_pallas


def case(rng, B, T, L, V):
    logits = rng.randn(B, T, V).astype(np.float32)
    logit_lens = np.full(B, T, np.int32)
    logit_lens[::3] = max(2 * L + 2, T // 2)
    labels = rng.randint(0, V - 1, size=(B, L)).astype(np.int32)
    label_lens = rng.randint(max(1, L // 2), L + 1, size=B).astype(np.int32)
    return (jnp.asarray(logits), jnp.asarray(logit_lens),
            jnp.asarray(labels), jnp.asarray(label_lens))


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- correctness at moderate shapes (R=8, 2 chunks) ----
    args = case(np.random.RandomState(0), B=16, T=256, L=48, V=29)

    @jax.jit
    def both(lg, ll, lab, labl):
        def pal(x):
            return jnp.sum(ctc_loss_pallas(x, ll, lab, labl,
                                           average_across_batch=False))

        def ref(x):
            return jnp.sum(ctc_loss(x, ll, lab, labl,
                                    average_across_batch=False))

        vp, gp = jax.value_and_grad(pal)(lg)
        vr, gr = jax.value_and_grad(ref)(lg)
        return vp, vr, gp, gr

    t0 = time.time()
    vp, vr, gp, gr = jax.device_get(both(*args))
    print("correctness compile+run {:.1f}s".format(time.time() - t0),
          flush=True)
    print("loss pallas={:.6f} ref={:.6f}".format(float(vp), float(vr)),
          flush=True)
    gerr = np.abs(gp - gr).max() / max(np.abs(gr).max(), 1e-9)
    print("grad rel-max-err {:.3e}".format(gerr), flush=True)
    ok = np.allclose(vp, vr, rtol=1e-3) and gerr < 5e-3
    print("CORRECTNESS {}".format("PASS" if ok else "FAIL"), flush=True)
    if not ok:
        sys.exit(1)

    # ---- timing at bench shapes ----
    B, T, L, V = 128, 1000, 190, 29
    args = case(np.random.RandomState(1), B=B, T=T, L=L, V=V)

    @jax.jit
    def pal_vg(lg, ll, lab, labl):
        return jax.value_and_grad(
            lambda x: jnp.sum(ctc_loss_pallas(x, ll, lab, labl,
                                              average_across_batch=False))
        )(lg)

    t0 = time.time()
    v, g = pal_vg(*args)
    v = float(jax.device_get(v))
    np.asarray(jax.device_get(g))
    print("bench-shape compile+run {:.1f}s loss={:.3f}".format(
        time.time() - t0, v), flush=True)
    times = []
    for _ in range(5):
        t0 = time.time()
        v, g = pal_vg(*args)
        float(jax.device_get(v))
        np.asarray(jax.device_get(g))
        times.append(time.time() - t0)
    print("fused pallas ctc value+grad at B={} T={} S=384: {:.1f} ms "
          "(min of 5: {:.1f} ms)".format(
              B, T, 1e3 * np.mean(times), 1e3 * min(times)), flush=True)
    print("TIMING DONE", flush=True)


if __name__ == "__main__":
    main()
