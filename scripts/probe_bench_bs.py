"""Probe Jasper bench throughput across batch sizes / remat on the real
chip to pick the round-2 bench config."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(batch_per_chip, remat, time_steps=1000, n_steps=10):
    import jax
    from openseq2seq_tpu.data.synthetic import SyntheticSpeechDataLayer
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.parallel.mesh import (make_mesh,
                                               replicated_sharding,
                                               shard_batch)
    from openseq2seq_tpu.zoo import jasper_model_params

    mesh = make_mesh(num_data=1, num_model=1)
    params = jasper_model_params(
        data_layer=SyntheticSpeechDataLayer,
        data_layer_params={
            "num_audio_features": 64, "tgt_vocab_size": 29,
            "time_steps": time_steps, "label_length": 160,
            "num_batches": 2,
        },
        num_blocks=10, block_repeat=5,
        batch_size_per_gpu=batch_per_chip,
        dtype="mixed", max_steps=1000000,
    )
    params["loss_params"] = {"use_pallas": True}
    if remat:
        params["remat"] = True
    model = Speech2Text(params=params, mode="train", mesh=mesh)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    device_batch = shard_batch(batch, mesh)
    step_fn = jax.jit(model.train_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        state, metrics = step_fn(state, device_batch, rng)
    float(jax.device_get(metrics["loss"]))
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step_fn(state, device_batch, rng)
    loss = float(jax.device_get(metrics["loss"]))
    wall = time.time() - t0
    assert np.isfinite(loss)
    return n_steps * batch_per_chip / wall


if __name__ == "__main__":
    for bs, remat in ((128, False), (256, False), (256, True),
                      (384, True), (512, True)):
        try:
            ups = run(bs, remat)
            print("bs={} remat={}: {:.1f} utt/s/chip".format(
                bs, remat, ups), flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)[:200]
            print("bs={} remat={}: FAILED {}".format(bs, remat, msg),
                  flush=True)
