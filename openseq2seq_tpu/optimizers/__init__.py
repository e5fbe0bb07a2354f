from .optimizers import build_optimizer, OPTIMIZER_REGISTRY, \
    get_lr_schedule_from_config
from .lr_policies import (fixed_lr, piecewise_constant, exp_decay, poly_decay,
                          cosine_decay, transformer_policy, inv_poly_decay,
                          make_lr_schedule, LR_POLICY_REGISTRY)
from .novograd import novograd, scale_by_novograd
from .larc import larc
from .loss_scaler import AutomaticLossScaler, LossScaleState, check_grads
from .mixed_precision import MixedPrecisionPolicy, get_mp_policy
