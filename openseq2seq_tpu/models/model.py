"""Model abstract class.

Keeps the reference ``Model`` contract (`open_seq2seq/models/model.py:
25-979`): schema'd config with the same key names (``batch_size_per_gpu``,
``num_epochs``/``max_steps``, ``lr_policy``, ``dtype``, ``loss_scaling``,
``iter_size``, ...), per-task metric hooks (``evaluate`` /
``finalize_evaluation`` / ``infer`` / ``finalize_inference`` /
``maybe_print_logs``), and objects/sec accounting — but replaces the
graph/session architecture:

  * no multi-tower replication and no Horovod: the model exposes a pure
    ``train_step(state, batch, rng) -> (state, metrics)`` that the
    trainer jits once over a ``(data, model)`` mesh; XLA inserts the
    gradient ``psum`` from the sharding annotations (the reference's
    `models/model.py:386-467` + `optimizers/optimizers.py:77-102`);
  * no MixedPrecisionOptimizerWrapper: parameters live in fp32 and flax
    modules compute in the policy dtype (bf16 under ``dtype="mixed"``);
    fp16 keeps the reference's loss-scaling semantics including
    skip-update-on-overflow (`optimizers/mp_wrapper.py:114-120`);
  * the data layer is a host-side numpy pipeline (see
    ``data/data_layer.py``).
"""
from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..optimizers import (AutomaticLossScaler, build_optimizer, check_grads,
                          get_lr_schedule_from_config, get_mp_policy)
from ..utils.logging import deco_print
from ..utils.params import check_params


class TrainState(flax.struct.PyTreeNode):
    """Everything that changes during training, as one pytree."""
    step: jax.Array
    params: Any
    model_state: Any          # mutable collections (batch_stats, ...)
    opt_state: Any
    loss_scale: Any           # LossScaleState or None


class Model(abc.ABC):

    @staticmethod
    def get_required_params():
        return {
            "batch_size_per_gpu": int,   # per-device batch (name kept for
                                         # config parity with the reference)
            "data_layer": None,
        }

    @staticmethod
    def get_optional_params():
        return {
            "logdir": str,
            "use_horovod": bool,          # accepted & ignored (parity)
            "num_gpus": int,              # accepted & ignored (mesh decides)
            "gpu_ids": list,              # accepted & ignored
            "load_model": str,
            "save_summaries_steps": None,
            "print_loss_steps": None,
            "print_samples_steps": None,
            "print_bench_info_steps": None,
            "save_checkpoint_steps": None,
            "num_checkpoints": int,
            "restore_best_checkpoint": bool,
            "eval_steps": int,
            "finetune": bool,
            "eval_batch_size_per_gpu": int,
            "random_seed": int,
            "num_epochs": int,
            "max_steps": int,
            "bench_start": int,
            "data_layer_params": dict,
            "optimizer": None,
            "optimizer_params": dict,
            "freeze_variables_regex": None,
            "initializer": None,
            "initializer_params": dict,
            "regularizer": None,
            "regularizer_params": dict,
            "dtype": None,                # 'mixed'|'float32'|'float16'|...
            "lr_policy": None,
            "lr_policy_params": dict,
            "max_grad_norm": float,
            "larc_params": dict,
            "loss_scaling": None,         # float or 'Backoff'/'LogMax'
            "loss_scaling_params": dict,
            "summaries": list,
            "iter_size": int,
            "lm_vocab_file": str,
            "processed_data_folder": str,
            "num_model_partitions": int,  # TPU: model-parallel mesh axis
            "num_data_partitions": int,
            "num_pipeline_stages": int,   # TPU: GPipe pipeline over a
                                          # "pipe" mesh axis (transformer
                                          # encoder stack; parallel/
                                          # pipeline.py)
            "num_pipeline_microbatches": int,
            "profile_dir": str,           # jax.profiler trace output
            "use_xla_jit": bool,          # accepted for config parity;
                                          # everything is jitted anyway
            "async_checkpoint": bool,     # overlap ckpt disk writes with
                                          # training (orbax async)
            "remat": [False, True, "blocks"],
                                          # activation rematerialization:
                                          # True (whole forward) or
                                          # "blocks" (save only tagged
                                          # block-boundary activations)
            "prng_impl": str,             # dropout RNG: None/"threefry2x32"
                                          # (reproducible default) or
                                          # "rbg" (TPU-accelerated
                                          # RngBitGenerator; dropout mask
                                          # generation is ~40% of a
                                          # transformer-big step under
                                          # threefry)
            "dropout_bits": [8, 32],      # dropout mask entropy width:
                                          # 32 = exact bernoulli (flax
                                          # semantics), 8 = u8 threshold
                                          # masks (4x less RNG volume;
                                          # keep prob quantized to 1/256)
            "compile_cache_dir": str,     # persistent XLA compilation
                                          # cache (jax_compilation_cache
                                          # _dir): first compile of the
                                          # train/eval step is 20-40 s on
                                          # TPU; later runs of the same
                                          # recipe reload it in <1 s.
                                          # Applied in run.py before any
                                          # jit.
            "dropout_remat": bool,        # key-only dropout residuals:
                                          # regenerate masks in backward
                                          # from the PRNG key instead of
                                          # storing them across the
                                          # fwd/bwd boundary (bit-exact
                                          # gradients; saves ~1 B/elem
                                          # of HBM residual per site)
                                          # — see parts/dropout.py
            "shard_params": bool,         # FSDP / ZeRO-3: dp-shard the
                                          # params at rest too (GSPMD
                                          # all-gathers per use,
                                          # reduce-scatters grads);
                                          # implies the zero1 moment
                                          # layout. parallel/mesh.py
            "shard_optimizer_states": bool,  # ZeRO-1: dp-shard the
                                          # optimizer moment leaves
                                          # (memory and update FLOPs
                                          # /= dp degree; math
                                          # unchanged — GSPMD inserts
                                          # one params all-gather).
                                          # parallel/mesh.py
            "fused_residual_dropout": bool,  # Pallas dropout(+residual)
                                          # kernels at the transformer
                                          # postprocess/relu sites: the
                                          # mask is drawn from the TPU
                                          # hardware PRNG inside the
                                          # kernel and never touches
                                          # HBM (ops/dropout_pallas.py)
            "fused_rnn": bool,            # fused Pallas LSTM scan for
                                          # eligible forward LSTMs
                                          # (W_h resident in VMEM;
                                          # ops/lstm_pallas.py)
        }

    def __init__(self, params: Dict[str, Any], mode: str = "train",
                 mesh=None, num_workers: int = 1, worker_id: int = 0):
        check_params(params, self.get_required_params(),
                     self.get_optional_params())
        self._params = dict(params)
        if mode not in ("train", "eval", "infer", "interactive_infer"):
            raise ValueError("Unknown mode: {}".format(mode))
        self._mode = mode
        self._interactive = (mode == "interactive_infer")
        self._mesh = mesh
        self._num_workers = num_workers
        self._worker_id = worker_id

        if "max_steps" in params and "num_epochs" in params:
            raise ValueError("You can't provide both max_steps and num_epochs")
        if mode == "train" and ("max_steps" not in params and
                                "num_epochs" not in params):
            raise ValueError("For training mode either max_steps or "
                             "num_epochs has to be provided")

        none_keys = ("print_samples_steps", "print_loss_steps",
                     "save_checkpoint_steps", "save_summaries_steps",
                     "print_bench_info_steps")
        defaults = {"print_samples_steps": None, "print_loss_steps": 10,
                    "save_checkpoint_steps": None,
                    "save_summaries_steps": None,
                    "print_bench_info_steps": None}
        for k in none_keys:
            self._params.setdefault(k, defaults[k])
        # print_samples every N print_loss steps for aligned output
        s, l = self._params["print_samples_steps"], self._params["print_loss_steps"]
        if s is not None and l is not None and s % l != 0:
            raise ValueError("print_samples_steps has to be a multiple of "
                             "print_loss_steps")

        self._dtype_policy = get_mp_policy(self._params.get("dtype"))
        self._params.setdefault("iter_size", 1)
        self._params.setdefault("regularizer_params", {})

        # process-global dropout mask width (read at jit-trace time;
        # see parts/dropout.py for why it is not a module attribute)
        from ..parts.dropout import (set_dropout_bits, set_dropout_remat,
                                     set_fused_dropout)
        set_dropout_bits(self._params.get("dropout_bits", 32))
        set_dropout_remat(self._params.get("dropout_remat", False))
        set_fused_dropout(self._params.get("fused_residual_dropout",
                                           False))

        base_seed = self._params.get("random_seed", 0)
        # per-worker seed offset for the DATA pipeline (reference
        # `models/model.py:308-313`); parameter init stays on the base
        # seed so every process builds identical params — the SPMD
        # replacement for the reference's rank-0 broadcast hook
        # (`utils/hooks.py:15-55`)
        self._seed = base_seed + worker_id
        self._rng = jax.random.PRNGKey(base_seed)

        # ---------------- data layer -----------------
        dl_params = dict(self._params.get("data_layer_params", {}))
        per_device = self._params["batch_size_per_gpu"]
        if mode == "eval" and "eval_batch_size_per_gpu" in self._params:
            per_device = self._params["eval_batch_size_per_gpu"]
        num_data_shards = 1
        if mesh is not None:
            num_data_shards = int(np.prod(
                [mesh.shape[a] for a in mesh.axis_names if a == "data"]))
        if num_workers > 1:
            # multi-host: the mesh is global but each process feeds only
            # its local portion of the batch (assembled in shard_batch)
            if num_data_shards % num_workers != 0:
                raise ValueError(
                    "data axis ({}) must divide evenly across {} "
                    "processes".format(num_data_shards, num_workers))
            num_data_shards //= num_workers
        dl_params["batch_size"] = per_device * num_data_shards
        self._global_batch_size = dl_params["batch_size"] * num_workers
        if "dtype" not in dl_params:
            dl_params["dtype"] = self._params.get("dtype")
        dl_params.pop("dtype", None)  # host pipeline is dtype-agnostic
        dl_params["mode"] = "infer" if mode == "interactive_infer" else mode
        dl_params["interactive"] = self._interactive
        if dl_params["mode"] != "train" and dl_params.get("shuffle"):
            # train configs are routinely reused for eval/infer; shuffle
            # only ever applies to training epochs
            dl_params["shuffle"] = False

        dl_class = self._params["data_layer"]
        self._data_layer = dl_class(dl_params, model=self,
                                    num_workers=num_workers,
                                    worker_id=worker_id)
        self._data_layer.seed(self._seed)

        # ---------------- step math -----------------
        self._steps_in_epoch = None
        self._last_step = self._params.get("max_steps", None)
        if mode == "train":
            size = self._data_layer.get_size_in_samples()
            if size > 0:
                # steps are MICRObatch steps (the train loop's unit);
                # with iter_size > 1 the optimizer advances every Nth —
                # num_epochs still means full passes over the data
                self._steps_in_epoch = max(
                    size // self._global_batch_size, 1)
            if "num_epochs" in self._params:
                if self._steps_in_epoch is None:
                    raise ValueError("num_epochs requires a sized data layer")
                self._last_step = (self._params["num_epochs"] *
                                   self._steps_in_epoch)

        # ---------------- loss scaling (fp16 path) -----------------
        self._loss_scaler: Optional[AutomaticLossScaler] = None
        self._static_loss_scale = 1.0
        if self._dtype_policy.use_loss_scaling:
            ls = self._params.get("loss_scaling", "Backoff")
            if isinstance(ls, (int, float)):
                self._static_loss_scale = float(ls)
            else:
                self._loss_scaler = AutomaticLossScaler(
                    algorithm=ls,
                    params=self._params.get("loss_scaling_params"))

        self._module = None
        self._tx = None

    # ------------------------------------------------------------------
    # properties (reference-compatible surface)
    # ------------------------------------------------------------------
    @property
    def params(self):
        return self._params

    @property
    def mode(self):
        return self._mode

    @property
    def mp_policy(self):
        return self._dtype_policy

    @property
    def steps_in_epoch(self):
        return self._steps_in_epoch

    @property
    def last_step(self):
        return self._last_step

    @property
    def mesh(self):
        return self._mesh

    def get_data_layer(self):
        return self._data_layer

    # ------------------------------------------------------------------
    # forward pass construction
    # ------------------------------------------------------------------
    @abc.abstractmethod
    def build_module(self):
        """Return the flax module of the full forward pass:
        ``module(batch, train) -> output dict``."""

    @abc.abstractmethod
    def compute_loss(self, outputs: Dict[str, Any], batch: Dict[str, Any]):
        """fp32 scalar task loss given forward outputs + batch."""

    def module(self):
        if self._module is None:
            self._module = self.build_module()
        return self._module

    def _resolved_lr_policy_params(self) -> Dict[str, Any]:
        """lr_policy_params with the reference's defaulting applied
        (ref `models/model.py:480-495`): a policy that takes
        ``decay_steps`` decays over the whole training run when the
        config doesn't pin it (minus warmup/begin_decay_at), and
        epoch-bounded policies get ``steps_per_epoch`` from the data
        layer — so recipes match the reference without hardcoding a
        steps-per-epoch guess."""
        lr_params = dict(self._params.get("lr_policy_params") or {})
        lr_policy = self._params.get("lr_policy")
        if lr_policy is None:
            return lr_params
        from inspect import signature

        from ..optimizers.lr_policies import LR_POLICY_REGISTRY
        fn = LR_POLICY_REGISTRY.get(lr_policy) \
            if isinstance(lr_policy, str) else lr_policy
        if fn is None:
            return lr_params
        fp = signature(fn).parameters
        if ("decay_steps" in fp and "decay_steps" not in lr_params
                and self._last_step):
            lr_params["decay_steps"] = self._last_step
            if "begin_decay_at" in fp:
                if "warmup_steps" in fp:
                    lr_params["begin_decay_at"] = max(
                        lr_params.get("begin_decay_at", 0),
                        lr_params.get("warmup_steps", 0))
                lr_params["decay_steps"] -= lr_params.get(
                    "begin_decay_at", 0)
        if ("steps_per_epoch" in fp
                and "steps_per_epoch" not in lr_params
                and "num_epochs" in self._params
                and self._steps_in_epoch):
            lr_params["steps_per_epoch"] = self._steps_in_epoch
        return lr_params

    def optimizer(self) -> optax.GradientTransformation:
        if self._tx is None:
            self._tx = build_optimizer(
                optimizer=self._params.get("optimizer", "Adam"),
                optimizer_params=self._params.get("optimizer_params", {}),
                lr_policy=self._params.get("lr_policy"),
                lr_policy_params=self._resolved_lr_policy_params(),
                max_grad_norm=self._params.get("max_grad_norm"),
                larc_params=self._params.get("larc_params"),
                iter_size=self._params.get("iter_size", 1),
            )
        return self._tx

    def auxiliary_losses(self, outputs) -> jax.Array:
        """Auxiliary regularizers surfaced by modules through the
        forward outputs (e.g. the MoE load-balancing loss) — added at
        this single choke point so every task model gets them."""
        enc = outputs.get("encoder_output") if isinstance(outputs, dict) \
            else None
        if isinstance(enc, dict):
            return enc.get("moe_aux_loss", jnp.float32(0.0))
        return jnp.float32(0.0)

    def regularization_loss(self, params) -> jax.Array:
        """L1/L2 penalty over kernel parameters — the TF variable
        regularizers' moral equivalent (always fp32, matching
        `optimizers/optimizers.py:59-74` + mp_regularizer_wrapper)."""
        reg = self._params.get("regularizer")
        if reg is None:
            return jnp.float32(0.0)
        scale = float(self._params.get("regularizer_params", {})
                      .get("scale", 0.0))
        if scale == 0.0:
            return jnp.float32(0.0)
        flat = flax.traverse_util.flatten_dict(params)
        total = jnp.float32(0.0)
        for path, value in flat.items():
            if path[-1] not in ("kernel", "embedding"):
                continue
            v32 = value.astype(jnp.float32)
            if reg in ("l2", "L2"):
                total = total + 0.5 * jnp.sum(jnp.square(v32))
            elif reg in ("l1", "L1"):
                total = total + jnp.sum(jnp.abs(v32))
            elif callable(reg):
                total = total + reg(v32)
            else:
                raise ValueError("Unknown regularizer {}".format(reg))
        return scale * total

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------
    def init_state(self, example_batch: Dict[str, Any]) -> TrainState:
        rng, init_rng, drop_rng = jax.random.split(self._rng, 3)
        self._rng = rng
        module = self.module()
        variables = module.init(
            {"params": init_rng, "dropout": drop_rng},
            _to_device_batch(example_batch), train=(self._mode == "train"))
        variables = dict(variables)
        params = variables.pop("params")
        params = self._dtype_policy.cast_to_param(params)
        # plain dict, matching what mutable apply returns from
        # train_step: keeps the TrainState pytree structure stable
        # across steps so the whole step can sit inside lax.scan /
        # fori_loop (multi-step chaining, pipelined drivers).
        model_state = flax.core.unfreeze(variables) if variables else {}
        opt_state = self.optimizer().init(params)
        loss_scale = (self._loss_scaler.init()
                      if self._loss_scaler is not None else None)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          model_state=model_state, opt_state=opt_state,
                          loss_scale=loss_scale)

    # ------------------------------------------------------------------
    # pure step functions (jitted by the trainer)
    # ------------------------------------------------------------------
    def loss_fn(self, params, model_state, batch, dropout_rng,
                train: bool = True):
        module = self.module()
        variables = {"params": params, **model_state}
        mutable = list(model_state.keys()) if train else False

        def forward(variables_, batch_):
            return module.apply(variables_, batch_, train=train,
                                rngs={"dropout": dropout_rng},
                                mutable=mutable)

        remat = self._params.get("remat", False)
        if train and remat:
            # rematerialize the forward pass during backprop: trades
            # recompute FLOPs for activation HBM, enabling larger
            # per-chip batches (the TPU replacement for the reference's
            # memory-driven batch limits). remat="blocks" keeps only
            # activations encoders tagged with checkpoint_name(
            # "block_boundary") — bounding the backward's live set to
            # one block's temporaries instead of the whole forward's.
            policy = None
            if remat == "blocks":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "block_boundary")
            forward = jax.checkpoint(forward, policy=policy)
        from ..parts.dropout import dropout_config
        # bind THIS model's dropout settings at trace time — the
        # construction-time global alone would be clobbered by any
        # model constructed after this one but before this trace
        from ..parts.rnns.rnn import fused_rnn_config
        with dropout_config(self._params.get("dropout_bits", 32),
                            self._params.get("dropout_remat", False),
                            self._params.get("fused_residual_dropout",
                                             False)), \
                fused_rnn_config(self._params.get("fused_rnn", False)):
            out = forward(variables, batch)
        if train:
            outputs, new_state = out
            new_state = flax.core.unfreeze(new_state)
        else:
            outputs, new_state = out, model_state
        loss = self.compute_loss(outputs, batch).astype(jnp.float32)
        loss = loss + self.auxiliary_losses(outputs)
        loss = loss + self.regularization_loss(params)
        return loss, (outputs, new_state)

    def train_step(self, state: TrainState, batch: Dict[str, Any],
                   dropout_rng) -> Tuple[TrainState, Dict[str, Any]]:
        """One optimizer step. Pure; shard/jit handled by the trainer."""
        scaler = self._loss_scaler
        static_scale = self._static_loss_scale
        use_scaling = self._dtype_policy.use_loss_scaling

        def scaled_loss_fn(params):
            loss, aux = self.loss_fn(params, state.model_state, batch,
                                     dropout_rng, train=True)
            scale = (state.loss_scale.scale if scaler is not None
                     else static_scale)
            return loss * (scale if use_scaling else 1.0), (loss, aux)

        grads, (loss, (outputs, new_model_state)) = jax.grad(
            scaled_loss_fn, has_aux=True)(state.params)

        metrics = {"loss": loss}
        new_loss_scale = state.loss_scale
        if use_scaling:
            scale = (state.loss_scale.scale if scaler is not None
                     else static_scale)
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32) / scale, grads)
            has_nan, amax = check_grads(grads)
            overflow = jnp.logical_or(has_nan, ~jnp.isfinite(amax))
            if scaler is not None:
                new_loss_scale = scaler.update(state.loss_scale, has_nan, amax)
                metrics["loss_scale"] = new_loss_scale.scale
            # skip update on overflow (reference mp_wrapper.py:114-120)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(overflow, jnp.zeros_like(g), g), grads)
            metrics["skipped_update"] = overflow.astype(jnp.int32)

        updates, new_opt_state = self.optimizer().update(
            grads, state.opt_state, state.params)
        freeze_re = self._params.get("freeze_variables_regex")
        if freeze_re:
            # zero updates for matching parameter paths (reference
            # `models/model.py` freeze_variables_regex semantics)
            import re
            pattern = re.compile(freeze_re)
            flat = flax.traverse_util.flatten_dict(updates)
            flat = {k: (jnp.zeros_like(v)
                        if pattern.search("/".join(k)) else v)
                    for k, v in flat.items()}
            updates = flax.traverse_util.unflatten_dict(flat)
        new_params = optax.apply_updates(state.params, updates)

        # same decay_steps/steps_per_epoch defaulting as the optimizer
        # build, so the logged lr is the lr actually applied
        lr_schedule = get_lr_schedule_from_config(
            dict(self._params,
                 lr_policy_params=self._resolved_lr_policy_params()))
        # state.step counts MICRObatch steps; under iter_size>1 the
        # optimizer (optax.MultiSteps) advances its inner schedule only
        # on real updates, so report the lr actually applied
        iter_size = int(self._params.get("iter_size", 1))
        lr_step = state.step // iter_size if iter_size > 1 else state.step
        metrics["learning_rate"] = jnp.asarray(lr_schedule(lr_step),
                                               jnp.float32)
        metrics["global_grad_norm"] = optax.global_norm(grads)
        # per-gradient summaries when requested (reference 'gradients' /
        # 'gradient_norm' summary modes, `optimizers/optimizers.py:289-330`)
        wanted = self._params.get("summaries", ())
        if "gradients" in wanted:
            metrics["gradients"] = grads
        if "gradient_norm" in wanted:
            metrics["gradient_norm"] = jax.tree_util.tree_map(
                jnp.linalg.norm, grads)
        if "variable_norm" in wanted:
            metrics["variable_norm"] = jax.tree_util.tree_map(
                jnp.linalg.norm, new_params)

        new_state = state.replace(step=state.step + 1, params=new_params,
                                  model_state=new_model_state,
                                  opt_state=new_opt_state,
                                  loss_scale=new_loss_scale)
        return new_state, metrics

    def eval_step(self, state: TrainState, batch: Dict[str, Any]
                  ) -> Dict[str, Any]:
        """Forward pass without dropout/BN-updates; returns outputs plus
        eval loss when targets are present."""
        module = self.module()
        variables = {"params": state.params, **state.model_state}
        # fixed dropout key: eval is deterministic, but modules that keep
        # sampling at inference (Tacotron prenet) still get an rng stream
        outputs = module.apply(variables, batch, train=False,
                               rngs={"dropout": jax.random.PRNGKey(0)})
        result = {"outputs": outputs}
        if "target_tensors" in batch:
            result["loss"] = self.compute_loss(outputs, batch)
        return result

    # ------------------------------------------------------------------
    # task hooks (same names/roles as the reference)
    # ------------------------------------------------------------------
    def maybe_print_logs(self, metrics: Dict[str, Any], step: int) -> None:
        deco_print("Global step {}: loss = {:.4f}, lr = {:.2e}".format(
            step, float(metrics["loss"]), float(metrics["learning_rate"])),
            offset=4)

    def print_samples(self, input_values, output_values, step: int) -> None:
        """Print a sample prediction from the current train batch every
        ``print_samples_steps`` (the reference's PrintSamplesHook,
        `utils/hooks.py:120-160`). Task models override."""

    def evaluate(self, input_values, output_values):
        """Accumulate per-batch eval results (host side, numpy)."""
        return []

    def finalize_evaluation(self, results_per_batch, training_step=None
                            ) -> Dict[str, Any]:
        return {}

    def infer(self, input_values, output_values):
        return []

    def finalize_inference(self, results_per_batch, output_file: str) -> None:
        raise NotImplementedError

    def _get_num_objects_per_step(self, batch: Dict[str, Any]) -> int:
        """Objects (frames/tokens/images) in a host batch, for
        objects/sec accounting (reference `models/model.py:960-979`)."""
        return int(batch["source_tensors"][0].shape[0])

    def get_num_objects_per_step(self, batch):
        return self._get_num_objects_per_step(batch)


def _to_device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """numpy batch -> jnp batch (leaves that are lists stay lists)."""
    return jax.tree_util.tree_map(jnp.asarray, batch)
