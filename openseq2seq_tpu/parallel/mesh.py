"""Device mesh and sharding utilities — the SPMD replacement for the
reference's two distribution modes (in-graph multi-tower replication,
`open_seq2seq/models/model.py:386-427`, and Horovod ring allreduce,
`optimizers/optimizers.py:77-102`).

One jitted train step runs over a `jax.sharding.Mesh` with axes
``("data", "model")``. Data parallelism shards the batch dimension over
``data``; gradients are reduced by the ``psum`` XLA derives from the
shardings (riding ICI within a slice, DCN across slices). The ``model``
axis is plumbed from day one so tensor parallelism can be enabled per
config without API changes (the reference has no TP at all — SURVEY §2.2).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: Optional[int] = None,
              num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices.

    ``num_data`` defaults to ``len(devices) // num_model``. The mesh is
    laid out with ``model`` as the minor (fastest-varying) axis so that
    model-parallel collectives ride the tightest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if num_model < 1:
        raise ValueError("num_model must be >= 1")
    if num_data is None:
        num_data = len(devices) // num_model
    need = num_data * num_model
    if need > len(devices):
        raise ValueError("Mesh {}x{} needs {} devices, have {}".format(
            num_data, num_model, need, len(devices)))
    grid = np.array(devices[:need]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(config: Dict[str, Any]) -> Mesh:
    """Build the mesh a model config asks for (``num_model_partitions``
    optional key; data axis gets the rest of the devices).

    ``num_gpus`` (reference config key) caps the data axis when
    ``num_data_partitions`` isn't given — a reference config asking for
    4 of 8 devices gets 4."""
    num_model = int(config.get("num_model_partitions", 1))
    num_pipe = int(config.get("num_pipeline_stages", 0) or 0)
    num_data = config.get("num_data_partitions", None)
    if not num_data:          # 0 / None -> auto (all remaining devices)
        num_data = None
        num_gpus = int(config.get("num_gpus", 0) or 0)
        if num_gpus > 0 and jax.process_count() == 1:
            # single-host only: a device-prefix mesh on a pod would
            # exclude other hosts' devices and desync shard_batch.
            # The pipe axis also consumes devices, so divide it out
            # too — otherwise num_gpus: 8 + num_pipeline_stages: 4 on
            # 8 devices over-requests a (8, 4, 1) mesh.
            avail = len(jax.devices()) // (max(num_model, 1) *
                                           max(num_pipe, 1))
            num_data = min(num_gpus, max(avail, 1))
    if num_pipe > 1:
        from .pipeline import make_pipeline_mesh
        return make_pipeline_mesh(num_stages=num_pipe, num_data=num_data,
                                  num_model=num_model)
    return make_mesh(num_data=num_data, num_model=num_model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch (pytree of numpy arrays) with the batch
    dim sharded over the data axis.

    Multi-host: each process holds only its LOCAL portion of the global
    batch (the data layer shards by worker), so the global array is
    assembled from the per-host shards via
    ``host_local_array_to_global_array`` — the SPMD replacement for the
    reference's per-rank Horovod feeding."""
    sharding = batch_sharding(mesh)
    multihost = jax.process_count() > 1 and any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flat)
    if multihost:
        from jax.experimental import multihost_utils as mhu

        def put_global(x):
            x = np.asarray(x)
            if x.ndim == 0:
                # host-side scalars (batch_valid) are consumed on the
                # host and may differ per process; replicate locally
                return x
            return mhu.host_local_array_to_global_array(
                x, mesh, P(DATA_AXIS))

        return jax.tree_util.tree_map(put_global, batch)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Wrap a host-batch iterator so the H2D transfer of batch N+1
    overlaps the device computation of batch N instead of sitting on
    the critical path. The JAX analogue of tf.data's prefetch-to-device
    / flax.jax_utils.prefetch_to_device, and it matters most when
    transfers are slow relative to the step (measured: Jasper bs128's
    33 MB feature batch costs ~0.4 s over a relay link vs a 0.78 s
    step).

    The transfer runs in a dedicated daemon thread: jax.device_put can
    block the calling thread until the copy lands (it does over relayed
    transports), so an in-generator device_put would stay on the
    consumer's critical path — a thread overlaps it regardless.
    ``size`` bounds how many batches sit in HBM ahead of consumption.

    Yields (host_batch, device_batch) pairs — trainers need the host
    view for bookkeeping (num objects, eval bookkeeping)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _worker():
        try:
            for batch in iterator:
                if not _put((batch, shard_batch(batch, mesh))):
                    return      # consumer closed: drop HBM refs and exit
        except BaseException as e:  # surface in the consumer, not stderr
            _put((_END, e))
            return
        _put((_END, None))

    t = threading.Thread(target=_worker, daemon=True,
                         name="prefetch_to_device")
    t.start()
    try:
        while True:
            item = q.get()
            if item[0] is _END:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        # train loops abandon the (infinite) iterator at last_step; let
        # the worker exit so its queued device batches free their HBM
        # before the final eval runs
        stop.set()
        with q.mutex:
            q.queue.clear()
        t.join(timeout=2.0)
        if not t.is_alive():
            # cascade: release the upstream featurizer generator's
            # thread too (only once the worker is out of the generator —
            # close() on an executing generator raises ValueError)
            close = getattr(iterator, "close", None)
            if close is not None:
                close()


# ---------------------------------------------------------------------------
# tensor-parallel parameter layouts (megatron-style; no reference
# counterpart — OpenSeq2Seq has no TP at all, SURVEY §2.2)
# ---------------------------------------------------------------------------
# Matched against "/"-joined parameter paths. Column-parallel layers
# (qkv / q / k / v projections, the ffn expansion) shard their OUTPUT
# features so the following row-parallel layer (attention out / ffn
# output) consumes the shard it owns and XLA inserts one psum per
# block. Embeddings are vocab-sharded. GSPMD guarantees the math is
# unchanged — specs only pick the layout.
DEFAULT_TP_RULES = (
    (r"(qkv|/q|/k|/v|filter)/kernel$", P(None, MODEL_AXIS)),
    (r"(qkv|/q|/k|/v|filter)/bias$", P(MODEL_AXIS)),
    (r"(out|output)/kernel$", P(MODEL_AXIS, None)),
    (r"embedding/embedding$", P(MODEL_AXIS, None)),
    # expert parallelism: MoE expert stacks shard on the expert dim
    (r"experts_w[12]$", P(MODEL_AXIS, None, None)),
    (r"experts_b[12]$", P(MODEL_AXIS, None)),
)


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


def tp_state_sharding(state, mesh: Mesh, rules=DEFAULT_TP_RULES,
                      zero1: bool = False, fsdp: bool = False):
    """Per-leaf NamedSharding pytree for a TrainState: TP rules applied
    by parameter name (optimizer moments mirror the param tree names,
    so they pick up the same layout), everything else replicated.
    Falls back to fully replicated when the model axis has size 1 or a
    shape doesn't divide.

    Pipeline meshes: leaves of a stacked pipelined layer stack
    (``pipeline_layers`` in the path, leading layer axis) shard that
    axis over ``pipe`` so each stage's devices hold only their own
    layers' params and optimizer moments.

    ``zero1`` (model param ``shard_optimizer_states``) additionally
    shards otherwise-replicated OPTIMIZER-STATE leaves over the data
    axis (first dimension divisible by its size) — ZeRO stage 1.
    Params stay replicated; GSPMD turns the sharded elementwise update
    into shard-local work plus one all-gather of the new params, so
    moment memory and update FLOPs drop by the dp degree. The math is
    unchanged up to fp reduction order (XLA re-tiles the gradient
    reductions to the new layout) — the same variance as changing the
    dp degree. Linear-update optimizers match the replicated layout to
    ~1e-7 (equivalence-tested with Momentum); Adam-family optimizers
    can amplify that noise to lr-sized differences on elements whose
    gradient is ~0 (step-1 update is sign(g)).

    ``fsdp`` (model param ``shard_params``) extends the same dp layout
    to the PARAMS (ZeRO-3-style fully sharded data parallelism):
    at-rest param memory also drops by the dp degree; GSPMD
    all-gathers each weight at its use sites and reduce-scatters its
    gradient — the standard FSDP communication pattern, obtained from
    sharding annotations alone. Implies the zero1 moment layout."""
    msize = mesh.shape.get(MODEL_AXIS, 1)
    psize = mesh.shape.get("pipe", 1)
    dsize = mesh.shape.get(DATA_AXIS, 1)

    def zero1_spec(name, leaf):
        if dsize <= 1:
            return P()
        dp_shardable = ((zero1 or fsdp) and name.startswith("opt_state")
                        or (fsdp and name.startswith("params")))
        if not dp_shardable:
            return P()
        for dim, n in enumerate(leaf.shape):
            if n % dsize == 0 and n > 0:
                return P(*((None,) * dim + (DATA_AXIS,)))
        return P()

    def spec_for(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return P()
        name = _path_str(path)
        if psize > 1 and "pipeline_layers" in name and \
                leaf.shape[0] % psize == 0:
            if msize > 1:
                # TP x PP: Megatron column/row sharding on top of the
                # pipe-sharded layer axis (same table the pipeline's
                # shard_map in_specs use — one source of truth)
                from ..parts.transformer.pipelined_stack import \
                    stacked_param_specs
                base = name.rsplit("/", 1)[-1]
                spec = stacked_param_specs(
                    {base: leaf}, model_axis=MODEL_AXIS)[base]
                ok = all(
                    ax != MODEL_AXIS or leaf.shape[d] % msize == 0
                    for d, ax in enumerate(spec))
                if ok:
                    return spec
            return P(*(("pipe",) + (None,) * (leaf.ndim - 1)))
        if msize == 1:
            return zero1_spec(name, leaf)
        for pat, spec in rules:
            if re.search(pat, name):
                for dim, ax in enumerate(spec):
                    if ax == MODEL_AXIS and (
                            dim >= leaf.ndim or
                            leaf.shape[dim] % msize != 0):
                        break
                else:
                    return spec
        return zero1_spec(name, leaf)

    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, spec_for(p, l)), state)


def eval_shard_bounds(total: int, num_workers: int, worker_id: int):
    """Deterministic contiguous eval/infer split across workers with the
    last worker taking the remainder (reference
    `data/speech2text/speech2text.py:200-210`)."""
    per = total // num_workers
    start = per * worker_id
    end = per * (worker_id + 1) if worker_id < num_workers - 1 else total
    return start, end
