"""ResNet v1/v2 encoder (reference
`open_seq2seq/encoders/resnet_encoder.py:12-149` +
`resnet_blocks.py:41-361`).

Standard/bottleneck residual blocks, version 1 (conv-BN-relu, post-add
relu) and version 2 (BN-relu preactivation), initial 7x7 conv + maxpool,
global average pool to ``final_size``. NHWC layout, bf16 compute with
fp32 BN statistics — the canonical MXU-friendly image model.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .encoder import Encoder


class ResNetV2Block(nn.Module):
    filters: int
    stride: int
    bottleneck: bool
    projection: bool
    bn_momentum: float
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)

        preact = jax.nn.relu(bn("preact_bn")(x))
        shortcut = x
        out_filters = self.filters * (4 if self.bottleneck else 1)
        if self.projection:
            shortcut = conv(out_filters, 1, self.stride, "proj")(preact)
        if self.bottleneck:
            y = conv(self.filters, 1, 1, "conv1")(preact)
            y = jax.nn.relu(bn("bn1")(y))
            y = conv(self.filters, 3, self.stride, "conv2")(y)
            y = jax.nn.relu(bn("bn2")(y))
            y = conv(out_filters, 1, 1, "conv3")(y)
        else:
            y = conv(self.filters, 3, self.stride, "conv1")(preact)
            y = jax.nn.relu(bn("bn1")(y))
            y = conv(out_filters, 3, 1, "conv2")(y)
        return shortcut + y


class ResNetV1Block(nn.Module):
    filters: int
    stride: int
    bottleneck: bool
    projection: bool
    bn_momentum: float
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)

        shortcut = x
        out_filters = self.filters * (4 if self.bottleneck else 1)
        if self.projection:
            shortcut = bn("proj_bn")(conv(out_filters, 1, self.stride,
                                          "proj")(x))
        if self.bottleneck:
            y = jax.nn.relu(bn("bn1")(conv(self.filters, 1, self.stride,
                                           "conv1")(x)))
            y = jax.nn.relu(bn("bn2")(conv(self.filters, 3, 1, "conv2")(y)))
            y = bn("bn3")(conv(out_filters, 1, 1, "conv3")(y))
        else:
            y = jax.nn.relu(bn("bn1")(conv(self.filters, 3, self.stride,
                                           "conv1")(x)))
            y = bn("bn2")(conv(out_filters, 3, 1, "conv2")(y))
        return jax.nn.relu(shortcut + y)


_RESNET_SIZES = {
    18: ([2, 2, 2, 2], False),
    34: ([3, 4, 6, 3], False),
    50: ([3, 4, 6, 3], True),
    101: ([3, 4, 23, 3], True),
    152: ([3, 8, 36, 3], True),
    200: ([3, 24, 36, 3], True),
}


class ResNetNet(nn.Module):
    block_sizes: Sequence[int]
    block_strides: Sequence[int]
    version: int
    bottleneck: bool
    first_num_filters: int
    first_kernel_size: int
    first_conv_stride: int
    first_pool_size: int
    first_pool_stride: int
    bn_momentum: float
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        x = nn.Conv(self.first_num_filters,
                    (self.first_kernel_size, self.first_kernel_size),
                    strides=(self.first_conv_stride,) * 2, padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="init_conv")(x)
        if self.version == 1:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=1e-5,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="init_bn")(x)
            x = jax.nn.relu(x)
        if self.first_pool_size:
            x = nn.max_pool(x, (self.first_pool_size,) * 2,
                            strides=(self.first_pool_stride,) * 2,
                            padding="SAME")

        block_cls = ResNetV2Block if self.version == 2 else ResNetV1Block
        for i, (n_blocks, stride) in enumerate(
                zip(self.block_sizes, self.block_strides)):
            filters = self.first_num_filters * (2 ** i)
            for j in range(n_blocks):
                x = block_cls(filters=filters,
                              stride=stride if j == 0 else 1,
                              bottleneck=self.bottleneck,
                              projection=(j == 0),
                              bn_momentum=self.bn_momentum,
                              dtype=self.dtype,
                              name="block{}_{}".format(i + 1, j + 1))(
                    x, train)
                # stage-boundary remat anchor (remat="blocks" policy)
                x = checkpoint_name(x, "block_boundary")
        if self.version == 2:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=1e-5,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="final_bn")(x)
            x = jax.nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))        # global average pool
        return x


class ResNetEncoder(Encoder):

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "resnet_size": int,
            "block_sizes": list,
            "block_strides": list,
            "version": [1, 2],
            "bottleneck": bool,
            "final_size": int,
            "first_num_filters": int,
            "first_kernel_size": int,
            "first_conv_stride": int,
            "first_pool_size": int,
            "first_pool_stride": int,
            "data_format": ["channels_first", "channels_last"],
            "regularize_bn": bool,
            "bn_momentum": float,
            "bn_epsilon": float,
        })

    def make_module(self):
        p = self._params
        size = p.get("resnet_size", 50)
        default_sizes, default_bottleneck = _RESNET_SIZES.get(
            size, ([3, 4, 6, 3], True))
        net = ResNetNet(
            block_sizes=p.get("block_sizes", default_sizes),
            block_strides=p.get("block_strides", [1, 2, 2, 2]),
            version=p.get("version", 2),
            bottleneck=p.get("bottleneck", default_bottleneck),
            first_num_filters=p.get("first_num_filters", 64),
            first_kernel_size=p.get("first_kernel_size", 7),
            first_conv_stride=p.get("first_conv_stride", 2),
            first_pool_size=p.get("first_pool_size", 3),
            first_pool_stride=p.get("first_pool_stride", 2),
            bn_momentum=p.get("bn_momentum", 0.997),
            dtype=self.compute_dtype)

        class ResNetEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x = input_dict["source_tensors"][0]
                return {"outputs": self.net(x, train)}

        return ResNetEncoderModule(net=net)
