"""TDNN encoder — Wave2Letter+ / Jasper / QuartzNet family.

Config-compatible with the reference's ``TDNNEncoder``
(`open_seq2seq/encoders/tdnn_encoder.py:14-265`): a ``convnet_layers``
list of block specs ``{type: conv1d|sep_conv1d, repeat, kernel_size,
stride, num_channels, padding, dilation, dropout_keep_prob, residual,
residual_dense}``, normalization in {batch_norm, layer_norm,
instance_norm, None}, sequence masking (``use_conv_mask``), stochastic
block drop (``drop_block_prob`` / ``drop_block_index``).

TPU-first design notes:
  * time-major transposes and NCHW/NHWC juggling are gone — everything
    is (B, T, C) with C minor so XLA tiles convs onto the MXU directly;
  * 1-D convs lower to ``lax.conv_general_dilated`` in the compute dtype
    (bf16 under the "mixed" policy) with fp32 params;
  * residual-add + norm + activation fuse into the conv epilogue in XLA;
  * Jasper's dense-residual topology (`residual_dense`) keeps a list of
    block outputs, exactly like the reference's
    ``conv_bn_res_bn_actv`` path (`parts/cnns/conv_blocks.py:19-123`).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .encoder import Encoder

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def resolve_activation(fn) -> Callable:
    if callable(fn):
        return fn
    if isinstance(fn, str):
        if fn not in ACTIVATIONS:
            raise ValueError("Unknown activation '{}'".format(fn))
        return ACTIVATIONS[fn]
    raise ValueError("activation_fn must be callable or a name")


def _mask_time(x, lengths):
    """Zero features at padded time positions: x (B, T, C), lengths (B,)."""
    mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
    return x * mask[:, :, None].astype(x.dtype)


def _out_length(lengths, stride):
    # SAME padding: ceil(len / stride)
    return (lengths + stride - 1) // stride


class _Norm(nn.Module):
    """normalization switch: batch/layer/instance/None."""
    kind: Optional[str]
    momentum: float
    epsilon: float
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kind is None:
            return x
        if self.kind == "batch_norm":
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.momentum,
                                epsilon=self.epsilon,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(x)
        if self.kind == "layer_norm":
            return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype,
                                param_dtype=jnp.float32)(x)
        if self.kind == "instance_norm":
            # normalize over time per (batch, channel)
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        raise ValueError("Unknown normalization '{}'".format(self.kind))


class TDNNNet(nn.Module):
    """The flax module behind :class:`TDNNEncoder`."""
    convnet_layers: tuple            # tuple of dict specs (hashable-ish)
    activation_fn: Callable
    dropout_keep_prob: float
    normalization: Optional[str]
    bn_momentum: float
    bn_epsilon: float
    use_conv_mask: bool
    drop_block_prob: float
    drop_block_index: int
    dtype: Any
    kernel_init: Optional[Callable] = None   # None: flax default

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        x = x.astype(self.dtype)
        kinit = self.kernel_init or nn.linear.default_kernel_init
        residuals: List[jax.Array] = []   # saved block outputs (dense topology)
        norm = lambda nm: _Norm(self.normalization, self.bn_momentum,  # noqa: E731
                                self.bn_epsilon, self.dtype, name=nm)

        for li, spec in enumerate(self.convnet_layers):
            kind = spec["type"]
            repeat = spec.get("repeat", 1)
            ch = spec["num_channels"]
            k = spec["kernel_size"][0]
            s = spec["stride"][0]
            d = spec.get("dilation", [1])[0]
            padding = spec.get("padding", "SAME")
            keep = spec.get("dropout_keep_prob", self.dropout_keep_prob)
            if not train:
                keep = 1.0
            residual = spec.get("residual", False)
            residual_dense = spec.get("residual_dense", False)

            if residual:
                block_input = x
                if residual_dense:
                    residuals.append(block_input)
                    res_sources = list(residuals)
                else:
                    res_sources = [block_input]

            for r in range(repeat):
                is_last = (r == repeat - 1)
                name = "conv{}_{}".format(li + 1, r + 1)
                if self.use_conv_mask:
                    x = _mask_time(x, lengths)
                if kind == "tcn":
                    # causal temporal conv (reference parts/cnns/tcn.py)
                    x = nn.Conv(ch, kernel_size=(k,), strides=(s,),
                                kernel_dilation=(d,), padding="CAUSAL",
                                kernel_init=kinit,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)(x)
                elif kind == "sep_conv1d":
                    in_ch = x.shape[-1]
                    x = nn.Conv(in_ch, kernel_size=(k,), strides=(s,),
                                kernel_dilation=(d,), padding=padding,
                                feature_group_count=in_ch,
                                kernel_init=kinit,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name + "_dw")(x)
                    x = nn.Conv(ch, kernel_size=(1,), dtype=self.dtype,
                                kernel_init=kinit,
                                param_dtype=jnp.float32,
                                name=name + "_pw")(x)
                else:
                    x = nn.Conv(ch, kernel_size=(k,), strides=(s,),
                                kernel_dilation=(d,), padding=padding,
                                kernel_init=kinit,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)(x)
                x = norm("norm{}_{}".format(li + 1, r + 1))(x, train)
                if s > 1:
                    lengths = _out_length(lengths, s)

                if residual and is_last:
                    # project every residual source to this block's width
                    res_sum = jnp.zeros_like(x)
                    for si, src in enumerate(res_sources):
                        proj = nn.Conv(ch, kernel_size=(1,),
                                       kernel_init=kinit,
                                       dtype=self.dtype,
                                       param_dtype=jnp.float32,
                                       name="res{}_{}".format(li + 1, si))(src)
                        proj = norm("resnorm{}_{}".format(li + 1, si))(
                            proj, train)
                        res_sum = res_sum + proj
                    # stochastic block drop ("blockout",
                    # tdnn_encoder drop_block_prob/index semantics)
                    if train and self.drop_block_prob > 0:
                        rng = self.make_rng("dropout")
                        drop = jax.random.bernoulli(rng, self.drop_block_prob)
                        x = jnp.where(drop, res_sum, x + res_sum)
                    elif (not train) and self.drop_block_index == li:
                        x = res_sum
                    else:
                        x = x + res_sum

                x = self.activation_fn(x)
                if keep < 1.0:
                    x = Dropout(rate=1.0 - keep,
                                   deterministic=not train)(x)
            # block-boundary remat anchor: under the model's
            # remat="blocks" policy only these activations are saved
            # for the backward pass (no-op otherwise)
            x = checkpoint_name(x, "block_boundary")
        if self.use_conv_mask:
            x = _mask_time(x, lengths)
        return x, lengths


class TDNNEncoder(Encoder):
    """Config wrapper. Cites: reference `encoders/tdnn_encoder.py:14-265`."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "dropout_keep_prob": float,
            "convnet_layers": list,
            "activation_fn": None,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "data_format": ["channels_first", "channels_last"],
            "normalization": [None, "batch_norm", "layer_norm",
                              "instance_norm"],
            "bn_momentum": float,
            "bn_epsilon": float,
            "use_conv_mask": bool,
            "drop_block_prob": float,
            "drop_block_index": int,
        })

    def make_module(self):
        from ..parts.initializers import resolve_initializer
        p = self._params
        net = TDNNNet(
            convnet_layers=tuple(p["convnet_layers"]),
            activation_fn=resolve_activation(p["activation_fn"]),
            dropout_keep_prob=p["dropout_keep_prob"],
            normalization=p.get("normalization", "batch_norm"),
            bn_momentum=p.get("bn_momentum", 0.90),
            bn_epsilon=p.get("bn_epsilon", 1e-3),
            use_conv_mask=p.get("use_conv_mask", False),
            drop_block_prob=p.get("drop_block_prob", 0.0),
            drop_block_index=p.get("drop_block_index", -1),
            dtype=self.compute_dtype,
            kernel_init=resolve_initializer(
                p.get("initializer"), p.get("initializer_params")),
        )

        class TDNNEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x, lengths = input_dict["source_tensors"][:2]
                outputs, out_len = self.net(x, lengths, train)
                return {"outputs": outputs, "src_length": out_len}

        return TDNNEncoderModule(net=net)
