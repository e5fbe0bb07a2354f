"""WaveNet encoder (reference
`open_seq2seq/encoders/wavenet_encoder.py:14-425`): mu-law encoding,
stacks of gated causal dilated convolutions with residual and skip
connections, conditioned on upsampled mel features; produces logits
over quantization channels (the decoder is a pass-through).

Training is fully parallel (teacher-forced over the whole waveform —
one batched conv program, ideal for the MXU). Naive autoregressive
generation is provided for synthesis via repeated forward passes
(fast-generation queues are a perf-round item).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoder import Encoder


def mu_law_encode(signal: jnp.ndarray, channels: int) -> jnp.ndarray:
    """[-1,1] float -> int ids in [0, channels) (reference
    `wavenet_encoder.py:14-25`)."""
    mu = float(channels - 1)
    safe = jnp.clip(signal, -1.0, 1.0)
    magnitude = jnp.log1p(mu * jnp.abs(safe)) / jnp.log1p(mu)
    encoded = jnp.sign(safe) * magnitude
    return ((encoded + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(ids: jnp.ndarray, channels: int) -> jnp.ndarray:
    mu = float(channels - 1)
    y = 2.0 * (ids.astype(jnp.float32) / mu) - 1.0
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(mu))) / mu


class WavenetNet(nn.Module):
    blocks: int
    layers_per_block: int
    filters: int
    kernel_size: int
    quantization_channels: int
    dtype_: Any

    @nn.compact
    def __call__(self, audio, audio_len, conditioning, train: bool):
        """audio: (B, T) float in [-1,1]; conditioning: (B, T, F) mel
        features upsampled to audio rate (or None)."""
        Q = self.quantization_channels
        labels = mu_law_encode(audio, Q)
        # input: one-hot of previous sample (shift right, causal)
        prev = jnp.concatenate(
            [jnp.full((audio.shape[0], 1), Q // 2, jnp.int32),
             labels[:, :-1]], axis=1)
        x = jax.nn.one_hot(prev, Q, dtype=self.dtype_)
        x = nn.Conv(self.filters, kernel_size=(self.kernel_size,),
                    padding="CAUSAL", dtype=self.dtype_,
                    param_dtype=jnp.float32, name="entry")(x)

        if conditioning is not None:
            cond = conditioning.astype(self.dtype_)
            if cond.shape[1] != x.shape[1]:
                # nearest-neighbor upsample mel frames to sample rate
                ratio = max(x.shape[1] // cond.shape[1], 1)
                cond = jnp.repeat(cond, ratio, axis=1)[:, :x.shape[1]]
                pad = x.shape[1] - cond.shape[1]
                if pad > 0:
                    cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)),
                                   mode="edge")
        else:
            cond = None

        skips = 0.0
        for b in range(self.blocks):
            for l in range(self.layers_per_block):
                dilation = 2 ** l
                name = "b{}_l{}".format(b + 1, l + 1)
                gate_in = nn.Conv(2 * self.filters,
                                  kernel_size=(self.kernel_size,),
                                  kernel_dilation=(dilation,),
                                  padding="CAUSAL", dtype=self.dtype_,
                                  param_dtype=jnp.float32,
                                  name=name + "_dilated")(x)
                if cond is not None:
                    gate_in = gate_in + nn.Conv(
                        2 * self.filters, kernel_size=(1,),
                        dtype=self.dtype_, param_dtype=jnp.float32,
                        name=name + "_cond")(cond)
                filt, gate = jnp.split(gate_in, 2, axis=-1)
                z = jnp.tanh(filt) * jax.nn.sigmoid(gate)
                res = nn.Conv(self.filters, kernel_size=(1,),
                              dtype=self.dtype_, param_dtype=jnp.float32,
                              name=name + "_res")(z)
                skip = nn.Conv(self.filters, kernel_size=(1,),
                               dtype=self.dtype_,
                               param_dtype=jnp.float32,
                               name=name + "_skip")(z)
                x = x + res
                skips = skips + skip

        out = jax.nn.relu(skips)
        out = nn.Conv(self.filters, kernel_size=(1,), dtype=self.dtype_,
                      param_dtype=jnp.float32, name="post1")(out)
        out = jax.nn.relu(out)
        logits = nn.Conv(Q, kernel_size=(1,), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="post2")(out)
        return {"logits": logits, "labels": labels,
                "audio_len": audio_len,
                "outputs": [labels, mu_law_decode(
                    jnp.argmax(logits, axis=-1), Q)]}


class WavenetEncoder(Encoder):
    """Config wrapper; schema mirrors the reference
    (`wavenet_encoder.py:179-203`)."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "layer_type": str,
            "kernel_size": int,
            "strides": int,
            "padding": str,
            "blocks": int,
            "layers_per_block": int,
            "filters": int,
            "quantization_channels": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "data_format": str,
            "bn_momentum": float,
            "bn_epsilon": float,
        })

    def make_module(self):
        p = self._params
        net = WavenetNet(
            blocks=p["blocks"],
            layers_per_block=p["layers_per_block"],
            filters=p["filters"],
            kernel_size=p["kernel_size"],
            quantization_channels=p["quantization_channels"],
            dtype_=self.compute_dtype)

        class WavenetEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                src = input_dict["source_tensors"]
                audio, audio_len = src[0], src[1]
                cond = src[2] if len(src) > 2 else None
                return self.net(audio, audio_len, cond, train)

        return WavenetEncoderModule(net=net)
