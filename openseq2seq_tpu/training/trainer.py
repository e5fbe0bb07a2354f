"""Train / evaluate / infer loops.

The functional replacement for the reference's MonitoredTrainingSession
machinery (`open_seq2seq/utils/funcs.py:22-260`, `utils/hooks.py`,
`utils/utils.py:95-263`): one jitted train step over the mesh, host-side
"hooks" inlined as plain code (loss printing, in-training evaluation with
best-model checkpoints, periodic saves, benchmark objects/sec).

Multi-device notes:
  * the batch is device_put with its leading dim sharded over the mesh's
    "data" axis; the state is replicated (model-parallel param shardings
    plug in here later). Under jit the semantics are *global*: the mean
    loss / summed gradients across shards are what XLA's psum computes —
    there is no allreduce code to write (vs. reference Horovod).
  * eval/infer iterate the data layer's deterministic epoch with
    last-batch clipping via ``batch_valid``.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..parallel import collective
from ..parallel.mesh import (make_mesh, prefetch_to_device,
                             replicated_sharding, tp_state_sharding)
from ..utils.logging import deco_print
from .checkpoint import CheckpointManager


def make_base_rng(params: Dict[str, Any]):
    """Base dropout key honoring ``prng_impl``.

    The default threefry2x32 is bit-reproducible everywhere but
    generates mask bits in pure VPU arithmetic — at transformer-big
    shapes the per-step dropout masks cost ~40% of step time on v5e
    (measured: 88.7k → 152.5k tokens/s/chip with dropout off).
    ``prng_impl: "rbg"`` switches the dropout stream to XLA's
    RngBitGenerator (hardware-accelerated on TPU, still a real
    counter-based RNG; key semantics — split/fold_in — unchanged).
    Parameter INIT keys stay threefry regardless, so checkpoints are
    reproducible across the setting."""
    seed = params.get("random_seed", 0)
    impl = params.get("prng_impl")
    if impl:
        return jax.random.key(seed, impl=impl)
    return jax.random.PRNGKey(seed)


def _prepare(model):
    mesh = model.mesh
    if mesh is None:
        mesh = make_mesh(num_data=1, num_model=1,
                         devices=jax.devices()[:1])
        model._mesh = mesh
    return mesh


def restore_state(model, checkpoint: Optional[str] = None):
    """Build an initial state (and restore from checkpoint if given)."""
    mesh = _prepare(model)
    dl = model.get_data_layer()
    try:
        example_batch = next(iter(dl.iterate_one_epoch()))
    except StopIteration:
        # interactive data layers have no dataset; init from a dummy
        # one-second silence example
        sr = dl.params.get("sample_freq", 16000)
        example_batch = dl.create_interactive_batch(
            (np.zeros(sr, np.float32), sr))
    state = model.init_state(example_batch)
    # TP param layouts by name (no-op replication when the model axis
    # has size 1); optimizer moments inherit the same specs. ZeRO-1
    # (shard_optimizer_states) dp-shards the remaining moment leaves.
    state_sharding = tp_state_sharding(
        state, mesh,
        zero1=model.params.get("shard_optimizer_states", False),
        fsdp=model.params.get("shard_params", False))
    state = jax.device_put(state, state_sharding)
    if checkpoint:
        state = CheckpointManager.restore(checkpoint, state)
        state = jax.device_put(state, state_sharding)
    elif model.params.get("load_model"):
        # transfer learning: partial restore of matching tensors
        from ..utils.config import _latest_checkpoint
        base = _latest_checkpoint(model.params["load_model"]) or \
            model.params["load_model"]
        params = CheckpointManager.restore_params_partial(base, state.params)
        state = state.replace(params=jax.device_put(
            params, tp_state_sharding(state, mesh).params))
    return state


def train(train_model, eval_model=None, checkpoint: Optional[str] = None):
    """Main training loop (reference `utils/funcs.py:22-220`)."""
    mesh = _prepare(train_model)
    params = train_model.params
    logdir = params.get("logdir", "")
    ckpt_mgr = None
    if logdir and params.get("save_checkpoint_steps") is not None:
        ckpt_mgr = CheckpointManager(
            logdir, params.get("num_checkpoints", 5),
            use_async=params.get("async_checkpoint", False))

    state = restore_state(train_model, checkpoint)
    start_step = int(state.step)

    # host-side writes (summaries, prints) happen on process 0 only —
    # reference rank-0 hook gating (`utils/funcs.py:45-95`)
    is_master = collective.is_master()
    summary_writer = None
    save_summaries_steps = params.get("save_summaries_steps")
    if logdir and save_summaries_steps and is_master:
        from ..utils.tb_writer import SummaryWriter
        summary_writer = SummaryWriter(logdir)

    step_fn = jax.jit(train_model.train_step, donate_argnums=(0,))
    base_rng = make_base_rng(train_model.params)

    dl = train_model.get_data_layer()
    # two-stage pipeline: featurization in a thread (host overlap),
    # then device_put two steps ahead (H2D-transfer overlap)
    batches = prefetch_to_device(dl.prefetch(dl.iterate_forever()), mesh)

    last_step = train_model.last_step
    print_loss_steps = params.get("print_loss_steps", 10)
    eval_steps = params.get("eval_steps", None)
    save_steps = params.get("save_checkpoint_steps", None)
    bench_start = params.get("bench_start", 10)

    profile_dir = params.get("profile_dir")
    if profile_dir:
        # jax.profiler trace of the first post-warmup steps (the TPU
        # replacement for the reference's --debug_port TensorBoard
        # debugger hook)
        jax.profiler.start_trace(profile_dir)

    deco_print("Starting training from step {}".format(start_step))
    total_objects = 0
    bench_objects = 0
    bench_t0 = None
    fetch_metrics = None
    step_times = []

    step = start_step
    try:
        while step < last_step:
            batch, device_batch = next(batches)
            num_objects = train_model.get_num_objects_per_step(batch)
            rng = jax.random.fold_in(base_rng, step)
            t0 = time.time()
            state, metrics = step_fn(state, device_batch, rng)

            step += 1
            total_objects += num_objects
            if bench_t0 is not None:
                bench_objects += num_objects

            if print_loss_steps and step % print_loss_steps == 0:
                fetch_metrics = jax.device_get(metrics)
                step_times.append(time.time() - t0)
                if is_master:
                    train_model.maybe_print_logs(fetch_metrics, step)

            print_samples_steps = params.get("print_samples_steps")
            if print_samples_steps and step % print_samples_steps == 0 and \
                    jax.process_count() == 1:
                # forward the current train batch once more and show a
                # sample prediction (reference PrintSamplesHook). Multi-host
                # runs skip this: a global-mesh eval dispatched from one
                # process would deadlock the pod, and running it everywhere
                # just to print on one host isn't worth a second forward.
                sample_out = _jitted_eval_fn(train_model)(state, device_batch)
                train_model.print_samples(
                    jax.tree_util.tree_map(np.asarray, batch),
                    jax.device_get(sample_out), step)

            if summary_writer and step % save_summaries_steps == 0:
                import jax.tree_util as jtu
                fetched = jax.device_get(metrics)
                grad_tree = fetched.pop("gradients", None)
                gnorm_tree = fetched.pop("gradient_norm", None)
                vnorm_tree = fetched.pop("variable_norm", None)
                summary_writer.add_scalars(
                    step, {"train/{}".format(k): v
                           for k, v in fetched.items()})

                def _named(tree):
                    for path, leaf in jtu.tree_leaves_with_path(tree):
                        yield ("/".join(str(getattr(p, "key", p))
                                        for p in path), leaf)

                if "variables" in params.get("summaries", ()):
                    for name, leaf in _named(jax.device_get(state.params)):
                        summary_writer.add_histogram(
                            step, "variables/{}".format(name), leaf)
                if grad_tree is not None:
                    for name, leaf in _named(grad_tree):
                        summary_writer.add_histogram(
                            step, "gradients/{}".format(name), leaf)
                for tree, tag in ((gnorm_tree, "gradient_norm"),
                                  (vnorm_tree, "variable_norm")):
                    if tree is not None:
                        summary_writer.add_scalars(
                            step, {"{}/{}".format(tag, n): float(v)
                                   for n, v in _named(tree)})

            if step == bench_start:
                jax.block_until_ready(state.params)
                bench_t0 = time.time()
                bench_objects = 0

            if save_steps and ckpt_mgr and step % save_steps == 0:
                jax.block_until_ready(state.params)
                ckpt_mgr.save(state, step)

            if eval_steps and eval_model is not None and step % eval_steps == 0:
                eval_metrics = evaluate_with_state(eval_model, state,
                                                   training_step=step)
                if summary_writer:
                    summary_writer.add_scalars(
                        step, {"eval/{}".format(k.replace(" ", "_")): v
                               for k, v in eval_metrics.items()
                               if isinstance(v, (int, float))})
                    for k, v in eval_metrics.items():
                        if k.startswith("image/") and isinstance(v, tuple):
                            png, h, w = v
                            summary_writer.add_image(
                                step, "eval/{}".format(k[6:]), png, h, w)
                        elif k.startswith("audio/") and isinstance(v, tuple):
                            samples, rate = v
                            summary_writer.add_audio(
                                step, "eval/{}".format(k[6:]), samples, rate)
                if ckpt_mgr and "eval_loss" in eval_metrics:
                    ckpt_mgr.save_best(state, step, eval_metrics["eval_loss"])

    finally:
        # release the prefetch pipeline NOW (not at GC): frees the
        # queued device batches' HBM before the final eval/checkpoint
        # below and stops both prefetch threads (tests construct many
        # trainers per process — abandoned threads would accumulate);
        # the finally also covers mid-training exceptions
        batches.close()
    jax.block_until_ready(state.params)
    if profile_dir:
        jax.profiler.stop_trace()
        deco_print("Profiler trace written to {}".format(profile_dir))
    wall = None
    if bench_t0 is not None and step > bench_start:
        wall = time.time() - bench_t0
        avg_objects = bench_objects / wall
        deco_print("Avg objects per second: {:.3f}".format(avg_objects))
        deco_print("Avg time per step: {:.3f}s".format(
            wall / (step - bench_start)))

    if ckpt_mgr:
        ckpt_mgr.save(state, step)
        ckpt_mgr.wait_until_finished()   # commit in-flight async saves
    deco_print("Finished training at step {}".format(step))
    result = {"state": state, "steps": step}
    if fetch_metrics is not None:
        result["last_metrics"] = fetch_metrics
    if wall is not None:
        result["objects_per_sec"] = bench_objects / wall
    return result


def _eval_setup(model, state):
    """Mesh + state for an eval/infer epoch.

    Multi-process runs evaluate WITHOUT cross-host lockstep: workers may
    own different numbers of eval batches (last worker takes the
    remainder), so a global-mesh program would deadlock. Instead each
    process copies the state onto a process-LOCAL mesh, evaluates its
    own contiguous data shard, and the per-batch results are
    host-gathered afterwards (reference Horovod eval had the same
    per-rank independence, `utils/utils.py:95-263`)."""
    mesh = _prepare(model)
    if jax.process_count() == 1:
        return mesh, state
    local = jax.local_devices()
    msize = mesh.shape.get("model", 1)
    if msize > 1 and len(local) % msize == 0:
        lmesh = make_mesh(num_data=len(local) // msize, num_model=msize,
                          devices=local)
    else:
        lmesh = make_mesh(num_data=len(local), num_model=1, devices=local)
    host_state = collective.fetch_host_tree(state)
    state = jax.device_put(host_state, tp_state_sharding(host_state, lmesh))
    return lmesh, state


def _jitted_eval_fn(model):
    """Cache the jitted eval step on the model: a fresh jax.jit of a
    bound method would re-trace on every in-training evaluation."""
    fn = getattr(model, "_cached_eval_fn", None)
    if fn is None:
        fn = jax.jit(model.eval_step)
        model._cached_eval_fn = fn
    return fn


def evaluate_with_state(model, state, training_step=None) -> Dict[str, Any]:
    """One full eval epoch with an existing state (in-training eval,
    reference `utils/hooks.py:192-236` + `utils/utils.py:95-263`)."""
    mesh, state = _eval_setup(model, state)
    eval_fn = _jitted_eval_fn(model)
    dl = model.get_data_layer()
    results = []
    for batch, device_batch in prefetch_to_device(
            dl.prefetch(dl.iterate_one_epoch()), mesh):
        out = jax.device_get(eval_fn(state, device_batch))
        results.append(model.evaluate(batch, out))
    # each process evaluated its own contiguous data shard; gather the
    # per-batch results so WER/BLEU/etc. are GLOBAL (reference
    # collect_if_horovod, `utils/utils.py:47-82`). Every process
    # finalizes the same global list, keeping best-checkpoint decisions
    # consistent across hosts.
    results = collective.collect_results(results, mode="gather")
    return model.finalize_evaluation(results, training_step=training_step)


def evaluate(model, checkpoint: Optional[str]) -> Dict[str, Any]:
    state = restore_state(model, checkpoint)
    metrics = evaluate_with_state(model, state)
    if collective.is_master():
        deco_print("Evaluation results: {}".format(
            {k: (round(v, 6) if isinstance(v, float) else v)
             for k, v in metrics.items()}))
    return metrics


def infer(model, checkpoint: Optional[str], output_file: str):
    state = restore_state(model, checkpoint)
    mesh, state = _eval_setup(model, state)
    eval_fn = _jitted_eval_fn(model)
    dl = model.get_data_layer()
    results = []
    for batch, device_batch in prefetch_to_device(
            dl.prefetch(dl.iterate_one_epoch()), mesh):
        out = jax.device_get(eval_fn(state, device_batch))
        results.append(model.infer(batch, out))
    # gather each process's shard, write the output file once
    results = collective.collect_results(results, mode="gather")
    if collective.is_master():
        model.finalize_inference(results, output_file)
    collective.barrier("finalize_inference")
    return results
