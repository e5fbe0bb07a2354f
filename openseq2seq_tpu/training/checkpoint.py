"""Checkpointing — orbax-backed, with the reference's semantics:
periodic saves keeping the newest ``num_checkpoints``
(`open_seq2seq/utils/funcs.py:71-82`), "best_models" checkpoints keyed
on eval loss (`utils/hooks.py:227-236`), and partial/transfer restore
by name+shape match (`utils/helpers.py:462-556`, ``load_model`` config
key).

Layout: ``logdir/checkpoints/<step>/`` and
``logdir/best_models/<step>/`` orbax PyTree checkpoints holding
{"params", "model_state", "opt_state", "step", "loss_scale"}.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..parallel import collective
from ..utils.logging import deco_print


def _tree_to_numpy(tree):
    # multihost-safe fetch: issues collectives for non-addressable
    # leaves, so it must run on every process (collective.fetch_host_tree)
    return collective.fetch_host_tree(tree)


class CheckpointManager:

    def __init__(self, logdir: str, num_checkpoints: int = 5,
                 use_async: bool = False):
        self.logdir = logdir
        self.num_checkpoints = num_checkpoints
        self.ckpt_dir = os.path.join(logdir, "checkpoints")
        self.best_dir = os.path.join(logdir, "best_models")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._async = bool(use_async)
        if self._async:
            # disk writes overlap the next training steps; the host
            # snapshot is taken synchronously so the donated state can
            # keep mutating (async_checkpoint config key)
            self._checkpointer = ocp.AsyncCheckpointer(
                ocp.PyTreeCheckpointHandler())
        else:
            self._checkpointer = ocp.PyTreeCheckpointer()
        # best eval loss persists across restarts (improves on the
        # reference, which reset it in memory every run)
        self._best_loss = self._read_best_loss()

    def wait_until_finished(self):
        """Block until any in-flight async save has committed."""
        if self._async:
            self._checkpointer.wait_until_finished()

    def _best_loss_path(self) -> str:
        return os.path.join(self.best_dir, "best_loss.txt")

    def _read_best_loss(self) -> float:
        """Best eval loss persisted by a previous run of THIS logdir.
        Only honored when a best checkpoint actually exists (a stale
        marker file alone must not suppress fresh saves), and the
        master's value is broadcast so every process takes the same
        save_best branches (they gate a collective orbax save)."""
        def read_local() -> float:
            try:
                has_ckpt = any(n.isdigit() for n in
                               os.listdir(self.best_dir))
                if not has_ckpt:
                    return float("inf")
                with open(self._best_loss_path()) as f:
                    return float(f.read().strip())
            except (OSError, ValueError):
                return float("inf")

        if collective.process_count() > 1:
            return collective.gather_object(read_local())[0]
        return read_local()

    @staticmethod
    def _state_tree(state, step: int):
        return {"step": int(step),
                "params": _tree_to_numpy(state.params),
                "model_state": _tree_to_numpy(state.model_state),
                "opt_state": _tree_to_numpy(state.opt_state),
                "loss_scale": _tree_to_numpy(state.loss_scale)
                if state.loss_scale is not None else None}

    # ------------------------------------------------------------------
    def save(self, state, step: int) -> str:
        path = os.path.join(self.ckpt_dir, str(step))
        tree = self._state_tree(state, step)  # all processes (collectives)
        # orbax is multihost-aware: every process must call save (it
        # syncs internally) but only the primary host writes files —
        # the reference's rank-0 CheckpointSaverHook gating
        self._checkpointer.save(path, tree, force=True)
        if collective.is_master():
            self._gc()
        collective.barrier("ckpt_save_{}".format(step))
        return path

    def save_best(self, state, step: int, eval_loss: float) -> Optional[str]:
        if eval_loss >= self._best_loss:
            return None
        self._best_loss = eval_loss
        tree = self._state_tree(state, step)  # all processes (collectives)
        path = os.path.join(self.best_dir, str(step))
        os.makedirs(self.best_dir, exist_ok=True)
        self.wait_until_finished()   # never rmtree an in-flight save
        if collective.is_master():
            # keep a single best checkpoint
            for name in os.listdir(self.best_dir):
                full = os.path.join(self.best_dir, name)
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
        collective.barrier("ckpt_best_clean_{}".format(step))
        self._checkpointer.save(path, tree, force=True)  # all processes
        if collective.is_master():
            with open(self._best_loss_path(), "w") as f:
                f.write(repr(float(eval_loss)))
            deco_print("Saving new best checkpoint (eval loss {:.4f})".format(
                eval_loss), offset=4)
        collective.barrier("ckpt_best_{}".format(step))
        return path

    def _gc(self):
        steps = sorted(int(n) for n in os.listdir(self.ckpt_dir)
                       if n.isdigit())
        for old in steps[:-self.num_checkpoints]:
            shutil.rmtree(os.path.join(self.ckpt_dir, str(old)),
                          ignore_errors=True)

    # ------------------------------------------------------------------
    @staticmethod
    def restore(path: str, state):
        """Restore a full train state from ``path`` into the structure of
        ``state`` (shapes/dtypes taken from it)."""
        checkpointer = ocp.PyTreeCheckpointer()
        tmpl = {"step": 0,
                "params": _tree_to_numpy(state.params),
                "model_state": _tree_to_numpy(state.model_state),
                "opt_state": _tree_to_numpy(state.opt_state),
                "loss_scale": _tree_to_numpy(state.loss_scale)
                if state.loss_scale is not None else None}
        restored = checkpointer.restore(path, item=tmpl)
        import jax.numpy as jnp
        return state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            model_state=restored["model_state"],
            opt_state=restored["opt_state"],
            loss_scale=state.loss_scale if state.loss_scale is None
            else jax.tree_util.tree_map(
                jnp.asarray, restored["loss_scale"]))

    @staticmethod
    def restore_params_partial(path: str, params) -> Any:
        """Transfer-learning restore: copy leaves whose path and shape
        match (reference ``load_model`` + `utils/helpers.py:462-556`).
        Returns new params; non-matching leaves keep their init values."""
        import flax
        checkpointer = ocp.PyTreeCheckpointer()
        restored = checkpointer.restore(path)
        src = restored.get("params", restored)
        flat_src = flax.traverse_util.flatten_dict(src)
        flat_dst = flax.traverse_util.flatten_dict(params)
        copied, skipped = 0, 0
        for key, value in flat_dst.items():
            if key in flat_src and np.shape(flat_src[key]) == np.shape(value):
                flat_dst[key] = np.asarray(flat_src[key], dtype=value.dtype)
                copied += 1
            else:
                skipped += 1
        deco_print("Partial restore: {} tensors copied, {} kept from "
                   "init".format(copied, skipped), offset=4)
        return flax.traverse_util.unflatten_dict(flat_dst)
