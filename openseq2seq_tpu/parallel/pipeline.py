"""Pipeline parallelism over a ``pipe`` mesh axis (beyond reference
parity — OpenSeq2Seq has data parallelism only, SURVEY §2.2).

GPipe-style schedule as a single SPMD program: each pipe shard holds
ONE stage's parameters (a pytree stacked on a leading stage axis and
sharded over ``pipe``); activations flow stage-to-stage with
``lax.ppermute`` over the ICI ring while microbatches stream through —
the standard TPU pipelining recipe (one program, no host
orchestration). The bubble fraction is (S-1)/(M+S-1) for S stages and
M microbatches.

``pipeline_apply`` is shape-preserving and composes with data
parallelism: give the mesh a ("data", "pipe") layout and shard the
batch over "data" as usual.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_pipeline_mesh(num_stages: int, num_data: Optional[int] = None,
                       num_model: int = 1,
                       devices: Optional[Sequence] = None) -> Mesh:
    """A ("data", "pipe") mesh — or ("data", "pipe", "model") when
    ``num_model > 1`` (TP x PP composition) — with ``model`` minor so
    the per-layer Megatron psums ride the tightest ICI links and
    stage-to-stage ppermute the next ring out."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if num_data is None:
        num_data = len(devices) // (num_stages * max(num_model, 1))
    need = num_data * num_stages * max(num_model, 1)
    if need > len(devices):
        raise ValueError("pipeline mesh {}x{}x{} needs {} devices, have "
                         "{}".format(num_data, num_stages, num_model,
                                     need, len(devices)))
    if num_model > 1:
        grid = np.array(devices[:need]).reshape(num_data, num_stages,
                                                num_model)
        return Mesh(grid, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    grid = np.array(devices[:need]).reshape(num_data, num_stages)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS))


def stack_stage_params(per_stage_params: Sequence[Any], mesh: Mesh):
    """Stack S per-stage pytrees on a leading stage axis and place the
    result sharded over the pipe axis (each device keeps only its
    stage's slice in memory)."""
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *per_stage_params)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(*((PIPE_AXIS,) + (None,) * (x.ndim - 1))))),
        stacked)


def pipeline_apply(stage_fn: Callable[[Any, Any], Any],
                   stacked_params: Any,
                   x: Any,
                   *,
                   mesh: Mesh,
                   num_microbatches: int,
                   param_specs: Any = None):
    """Run ``x`` through S pipelined stages.

    ``stage_fn(local_params, h) -> h'`` must be shape-preserving (the
    homogeneous-stage contract, e.g. k transformer layers).
    ``stacked_params`` leaves carry a leading LAYER axis divisible by
    S; each pipe shard receives its local (layers/S, ...) slice —
    stage_fn scans over that leading axis itself (a single-layer-per-
    stage caller just squeezes it). ``x`` may be a single (B, ...)
    array or a PYTREE of (B, ...) arrays (activations plus side inputs
    like attention biases / rng rows that must travel with their
    microbatch); B divisible by num_microbatches (per data shard).

    ``param_specs``: optional PartitionSpec pytree overriding the
    default P(pipe, None, ...) per-leaf layout — used by the TP x PP
    composition to ALSO shard kernel leaves over the mesh "model"
    axis; ``stage_fn`` is then responsible for the matching Megatron
    psums (activations stay replicated over model).
    """
    S = mesh.shape[PIPE_AXIS]
    M = num_microbatches
    dsize = mesh.shape.get(DATA_AXIS, 1)
    tmap = jax.tree_util.tree_map
    x_leaves = jax.tree_util.tree_leaves(x)
    per_shard = x_leaves[0].shape[0] // dsize
    if per_shard % M != 0 or per_shard == 0:
        raise ValueError(
            "pipeline_apply: per-data-shard batch {} must be divisible "
            "by num_microbatches {} (global batch {}, data shards "
            "{})".format(per_shard, M, x_leaves[0].shape[0], dsize))

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if param_specs is None:
        param_specs = tmap(
            lambda l: P(*((PIPE_AXIS,) + (None,) * (l.ndim - 1))),
            stacked_params)
    x_spec = tmap(
        lambda l: P(DATA_AXIS) if DATA_AXIS in mesh.axis_names else P(),
        x)

    @partial(shard_map, mesh=mesh,
             in_specs=(param_specs, x_spec), out_specs=x_spec)
    def run(local, xl):
        # local leaves: (layers/S, ...) slice owned by this pipe shard
        stage = jax.lax.axis_index(PIPE_AXIS)
        b = jax.tree_util.tree_leaves(xl)[0].shape[0] // M
        mb = tmap(lambda a: a.reshape((M, b) + a.shape[1:]), xl)
        # the carry becomes pipe-varying after ppermute/axis_index;
        # mark the zero inits accordingly (new shard_map VMA typing)
        def _vary(z):
            try:
                return jax.lax.pcast(z, PIPE_AXIS, to="varying")
            except (AttributeError, TypeError):  # older jax
                return jax.lax.pvary(z, PIPE_AXIS)

        out = tmap(lambda a: _vary(jnp.zeros_like(a)), mb)
        state = tmap(lambda a: _vary(jnp.zeros_like(a[0])), mb)
        perm = [(i, i + 1) for i in range(S - 1)]

        def tick(t, carry):
            state, out = carry
            # stage 0 ingests microbatch t (zeros once drained)
            feed_idx = jnp.minimum(t, M - 1)
            feed = tmap(lambda a: jnp.where(
                t < M,
                jax.lax.dynamic_index_in_dim(a, feed_idx, 0,
                                             keepdims=False),
                jnp.zeros_like(a[0])), mb)
            inp = tmap(lambda f, s: jnp.where(stage == 0, f, s),
                       feed, state)
            y = stage_fn(local, inp)
            # last stage emits microbatch t-(S-1)
            emit_idx = jnp.clip(t - (S - 1), 0, M - 1)
            emit = jnp.logical_and(stage == S - 1, t >= S - 1)

            def _emit(o, yl):
                cur = jax.lax.dynamic_index_in_dim(o, emit_idx, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(emit, yl, cur), emit_idx, 0)
            out = tmap(_emit, out, y)
            # hand activations to the next stage over the ICI ring
            state = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return state, out

        _, out = jax.lax.fori_loop(0, M + S - 1, tick, (state, out))
        # every pipe shard computed only its own stage; the final
        # activations live on the LAST shard — mask + psum broadcasts
        # them so the output is replicated over pipe
        if S > 1:
            out = tmap(lambda o: jax.lax.psum(
                jnp.where(stage == S - 1, o, jnp.zeros_like(o)),
                PIPE_AXIS), out)
        return tmap(lambda o, a: o.reshape(a.shape), out, xl)

    return run(stacked_params, x)
