"""Weight-initializer resolution for config-driven modules.

The reference passes TF initializers through configs (e.g. the Jasper
recipe's ``tf.contrib.layers.xavier_initializer`` with
``initializer_params={'uniform': False}`` —
`example_configs/speech2text/jasper10x5_LibriSpeech_nvgrad_masks.py:151-154`).
Here configs name the initializer (or hand a jax/flax initializer
callable) and :func:`resolve_initializer` maps it to a
``jax.nn.initializers``-style callable usable as ``kernel_init``.

Name map (TF → jax): ``xavier``/``glorot`` → ``glorot_{normal,uniform}``
(the TF ``uniform`` flag picks the variant), ``he``/``kaiming`` →
``he_*``, ``lecun`` → ``lecun_*``. ``None`` keeps each flax layer's own
default (lecun_normal for Conv/Dense), matching the reference where an
unset initializer keeps TF's per-layer default.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.nn.initializers as jinit

_NAMED: Dict[str, Callable[..., Callable]] = {
    "xavier_normal": jinit.glorot_normal,
    "xavier_uniform": jinit.glorot_uniform,
    "glorot_normal": jinit.glorot_normal,
    "glorot_uniform": jinit.glorot_uniform,
    "lecun_normal": jinit.lecun_normal,
    "lecun_uniform": jinit.lecun_uniform,
    "he_normal": jinit.he_normal,
    "he_uniform": jinit.he_uniform,
    "kaiming_normal": jinit.he_normal,
    "kaiming_uniform": jinit.he_uniform,
    "orthogonal": jinit.orthogonal,
    "zeros": lambda: jinit.zeros,
    "ones": lambda: jinit.ones,
}


def resolve_initializer(init: Any,
                        init_params: Optional[Dict[str, Any]] = None
                        ) -> Optional[Callable]:
    """Map a config ``initializer`` (+ ``initializer_params``) to a jax
    initializer callable, or None to keep the layer default.

    Accepts: None; a name from the table above (``"xavier"`` and
    ``"glorot"`` honor the TF-style ``{"uniform": bool}`` param, default
    normal per the Jasper recipe); a jax initializer (callable taking
    (key, shape, dtype)); or a zero-arg factory returning one.
    """
    init_params = dict(init_params or {})
    if init is None:
        return None
    if isinstance(init, str):
        name = init.lower()
        if name in ("xavier", "glorot", "he", "kaiming", "lecun"):
            variant = "uniform" if init_params.pop("uniform", False) \
                else "normal"
            name = "{}_{}".format(name, variant)
        if name not in _NAMED:
            raise ValueError(
                "Unknown initializer '{}' (known: {})".format(
                    init, ", ".join(sorted(_NAMED))))
        return _NAMED[name](**init_params)
    if callable(init):
        # a factory like jax.nn.initializers.glorot_normal needs calling
        # with its params; an already-built initializer takes
        # (key, shape, ...) — distinguish by trying the factory call
        if init_params:
            return init(**init_params)
        try:
            return init()
        except TypeError:
            return init
    raise ValueError("initializer must be None, a name, or a callable; "
                     "got {!r}".format(init))
