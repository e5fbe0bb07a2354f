"""Optimizer construction from config — the equivalent of the reference's
``optimize_loss`` (`open_seq2seq/optimizers/optimizers.py:107-286`), built
on optax gradient transformations instead of TF graph rewriting.

The returned transformation implements the same processing order the
reference uses: global-norm clipping -> LARC rescaling -> optimizer
update scaled by the LR schedule. Gradient reduction across data-parallel
devices needs no code here at all — the train step is jitted over a mesh
and XLA inserts the ``psum`` (the reference needed explicit Horovod
allreduce, `optimizers/optimizers.py:77-102`). ``iter_size`` gradient
accumulation (`optimizers/optimizers.py:213-259`) maps to
``optax.MultiSteps``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import optax

from .larc import larc as larc_transform
from .lr_policies import make_lr_schedule
from .novograd import scale_by_novograd

# name -> (factory(optimizer_params, lr_schedule) -> GradientTransformation)
# mirrors OPTIMIZER_CLS_NAMES (`optimizers/optimizers.py:36-44`) + NovoGrad.


def _sgd(p, lr):
    return optax.sgd(lr)


def _momentum(p, lr):
    return optax.sgd(lr, momentum=p.get("momentum", 0.9),
                     nesterov=p.get("use_nesterov", False))


def _adam(p, lr):
    return optax.adam(lr, b1=p.get("beta1", 0.9), b2=p.get("beta2", 0.999),
                      eps=p.get("epsilon", 1e-8),
                      mu_dtype=p.get("moments_dtype"))


def _adamw(p, lr):
    return optax.adamw(lr, b1=p.get("beta1", 0.9), b2=p.get("beta2", 0.999),
                       eps=p.get("epsilon", 1e-8),
                       weight_decay=p.get("weight_decay", 0.0),
                       mu_dtype=p.get("moments_dtype"))


def _adagrad(p, lr):
    return optax.adagrad(
        lr, initial_accumulator_value=p.get("initial_accumulator_value", 0.1))


def _rmsprop(p, lr):
    return optax.rmsprop(lr, decay=p.get("decay", 0.9),
                         eps=p.get("epsilon", 1e-10),
                         momentum=p.get("momentum", 0.0))


def _novograd(p, lr):
    return optax.chain(
        scale_by_novograd(beta1=p.get("beta1", 0.95),
                          beta2=p.get("beta2", 0.98),
                          epsilon=p.get("epsilon", 1e-8),
                          weight_decay=p.get("weight_decay", 0.0),
                          grad_averaging=p.get("grad_averaging", False),
                          moments_dtype=p.get("moments_dtype")),
        optax.scale_by_learning_rate(lr),
    )


OPTIMIZER_REGISTRY: Dict[str, Callable] = {
    "SGD": _sgd,
    "Momentum": _momentum,
    "Adam": _adam,
    "AdamW": _adamw,
    "Adagrad": _adagrad,
    "RMSProp": _rmsprop,
    "NovoGrad": _novograd,
}


def build_optimizer(optimizer: Any,
                    optimizer_params: Optional[Dict[str, Any]] = None,
                    lr_policy: Any = None,
                    lr_policy_params: Optional[Dict[str, Any]] = None,
                    max_grad_norm: Optional[float] = None,
                    larc_params: Optional[Dict[str, Any]] = None,
                    iter_size: int = 1,
                    weight_decay_mask: Any = None,
                    ) -> optax.GradientTransformation:
    """Build the full optax chain for a model config.

    Args:
      optimizer: registry name (str) or a callable
        ``(optimizer_params, lr_schedule) -> GradientTransformation``.
      optimizer_params: dict of optimizer hyperparameters.
      lr_policy: schedule callable or registry name; defaults to the fixed
        ``optimizer_params["learning_rate"]``.
      max_grad_norm: clip gradients by global norm if set (reference's
        ``max_grad_norm`` config key).
      larc_params: LARC config dict (``larc_eta`` required).
      iter_size: gradient-accumulation factor (>=1).
    """
    optimizer_params = dict(optimizer_params or {})
    del weight_decay_mask  # reserved for future per-leaf wd masking

    if lr_policy is None:
        base_lr = optimizer_params.get("learning_rate", None)
        if base_lr is None:
            raise ValueError("Either lr_policy or optimizer_params"
                             "['learning_rate'] must be given")
        lr_schedule = lambda step: base_lr  # noqa: E731
    else:
        lrp = dict(lr_policy_params or {})
        if "learning_rate" not in lrp and "learning_rate" in optimizer_params:
            lrp["learning_rate"] = optimizer_params["learning_rate"]
        lr_schedule = make_lr_schedule(lr_policy, lrp)
    optimizer_params.pop("learning_rate", None)

    if isinstance(optimizer, str):
        if optimizer not in OPTIMIZER_REGISTRY:
            raise ValueError("Unknown optimizer '{}'. Available: {}".format(
                optimizer, sorted(OPTIMIZER_REGISTRY)))
        factory = OPTIMIZER_REGISTRY[optimizer]
    elif callable(optimizer):
        factory = optimizer
    else:
        raise ValueError("optimizer must be a registry name or callable")

    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if larc_params is not None:
        chain.append(larc_transform(
            larc_eta=float(larc_params["larc_eta"]),
            larc_mode=larc_params.get("larc_mode", "clip"),
            min_update=larc_params.get("min_update", 1e-7),
            epsilon=larc_params.get("epsilon", 1e-7),
            learning_rate=lr_schedule))
    chain.append(factory(optimizer_params, lr_schedule))

    tx = optax.chain(*chain)
    if iter_size and iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(iter_size))
    return tx


def get_lr_schedule_from_config(config: Dict[str, Any]) -> Callable:
    """Extract the LR schedule a config describes (for logging)."""
    lrp = dict(config.get("lr_policy_params") or {})
    opt_params = config.get("optimizer_params") or {}
    if "learning_rate" not in lrp and "learning_rate" in opt_params:
        lrp["learning_rate"] = opt_params["learning_rate"]
    lr_policy = config.get("lr_policy")
    if lr_policy is None:
        base = lrp.get("learning_rate", 0.0)
        return lambda step: base
    return make_lr_schedule(lr_policy, lrp)
