"""Host-side multi-process collectives.

The reference gathers per-worker eval/infer results with mpi4py
(`open_seq2seq/utils/utils.py:47-82` ``collect_if_horovod``) and writes
checkpoints/summaries only from Horovod rank 0 (`utils/hooks.py`,
`utils/funcs.py:71-95`). The TPU-native equivalents here ride JAX's
distributed runtime: arbitrary picklable per-batch results are gathered
via ``multihost_utils.process_allgather`` over uint8 payload arrays, and
``is_master()`` gates filesystem writes to process 0.

Everything degrades to a no-op in single-process runs, so the same
trainer code path serves one chip and a multi-host pod.
"""
from __future__ import annotations

import pickle
from typing import Any, List, Sequence

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_master() -> bool:
    """True on the process that owns filesystem writes (checkpoints,
    summaries, inference outputs) — reference rank-0 gating."""
    return jax.process_index() == 0


def gather_object(obj: Any) -> List[Any]:
    """All-gather an arbitrary picklable object; returns the list of
    every process's object, ordered by process index (everywhere).

    Implementation: pickle -> uint8 payload, allgather lengths, pad to
    the max, allgather payloads, unpickle each. Single process: [obj].
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mhu

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lengths = mhu.process_allgather(np.array(payload.size, np.int64))
    lengths = np.asarray(lengths).reshape(-1)
    padded = np.zeros(int(lengths.max()), np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(mhu.process_allgather(padded))
    return [pickle.loads(gathered[i, :int(lengths[i])].tobytes())
            for i in range(gathered.shape[0])]


def collect_results(results_per_batch: Sequence[Any],
                    mode: str = "gather") -> List[Any]:
    """Combine per-batch eval/infer results across processes (reference
    ``collect_if_horovod``, `utils/utils.py:47-82`).

    mode="gather": concatenate every worker's per-batch list in process
    order (eval data is sharded contiguously per worker, so this
    restores the global epoch order). mode="sum": elementwise sum.
    Unlike the reference (root-only), every process gets the combined
    value, so downstream decisions (e.g. best-checkpoint) stay
    consistent across hosts.
    """
    if jax.process_count() == 1:
        return list(results_per_batch)
    per_worker = gather_object(list(results_per_batch))
    if mode == "gather":
        out: List[Any] = []
        for worker_results in per_worker:
            out.extend(worker_results)
        return out
    if mode == "sum":
        total = per_worker[0]
        for other in per_worker[1:]:
            total = jax.tree_util.tree_map(lambda a, b: a + b, total, other)
        return total
    raise ValueError("Unknown collect mode: {}".format(mode))


def fetch_host_tree(tree: Any) -> Any:
    """Fetch a (possibly multi-host sharded) jax pytree to host numpy.

    Must be called on ALL processes (it may issue collectives for
    non-fully-addressable arrays); only then may the caller gate the
    actual filesystem write on ``is_master()``.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils as mhu

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(mhu.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)


def barrier(name: str = "barrier") -> None:
    """Cross-process sync point (reference MPI barrier, `run.py:48-49`)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils as mhu

    mhu.sync_global_devices(name)
