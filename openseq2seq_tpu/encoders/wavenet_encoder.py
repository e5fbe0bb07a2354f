"""WaveNet encoder (reference
`open_seq2seq/encoders/wavenet_encoder.py:14-425`): mu-law encoding,
stacks of gated causal dilated convolutions with residual and skip
connections, conditioned on upsampled mel features; produces logits
over quantization channels (the decoder is a pass-through).

Training is fully parallel (teacher-forced over the whole waveform —
one batched conv program, ideal for the MXU). Synthesis uses
fast-WaveNet generation (`wavenet_generate`): per-layer ring-buffer
queues inside one `lax.scan`, so each sample costs only the per-layer
tap matmuls instead of a full receptive-field re-run.
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


def wavenet_generate(net_params, n_samples: int, *, blocks: int,
                     layers_per_block: int, kernel_size: int,
                     quantization_channels: int, conditioning=None,
                     batch_size: int = 1, temperature: float = 0.0,
                     rng=None):
    """Fast-WaveNet autoregressive synthesis (reference runs the naive
    per-sample session loop, `models/text2speech_wavenet.py`): each
    dilated layer keeps a ring buffer of its last ``d*(K-1)+1`` inputs;
    one `lax.scan` step advances every queue and emits one sample.

    Args:
      net_params: the trained ``WavenetNet`` param subtree (the dict
        holding "entry", "b{i}_l{j}_*", "post1", "post2").
      conditioning: optional (B, T, F_mel) mel features; upsampled by
        repetition to ``n_samples``.
      temperature: 0 -> argmax decoding, otherwise softmax sampling.

    Returns (ids, audio, logits): (B, n_samples) int ids, the mu-law
    decoded float waveform, and the per-step logits (B, n_samples, Q).
    """
    K = kernel_size
    Q = quantization_channels
    p = net_params
    entry_k = jnp.asarray(p["entry"]["kernel"])      # (K, Q, F)
    entry_b = jnp.asarray(p["entry"]["bias"])
    F = entry_k.shape[-1]
    B = batch_size
    if rng is None:
        rng = jax.random.PRNGKey(0)

    specs = []
    for b in range(blocks):
        for l in range(layers_per_block):
            name = "b{}_l{}".format(b + 1, l + 1)
            specs.append((name, 2 ** l))

    if conditioning is not None:
        cond = jnp.asarray(conditioning, jnp.float32)
        ratio = max(n_samples // cond.shape[1], 1)
        cond = jnp.repeat(cond, ratio, axis=1)[:, :n_samples]
        pad = n_samples - cond.shape[1]
        if pad > 0:
            cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)), mode="edge")
        # pre-apply the per-layer 1x1 conditioning convs outside the
        # scan: one big matmul per layer instead of one per sample
        cond_proj = jnp.stack(
            [cond @ jnp.asarray(p[n + "_cond"]["kernel"])[0] +
             jnp.asarray(p[n + "_cond"]["bias"]) for n, _ in specs])
    else:
        cond_proj = jnp.zeros((len(specs), B, n_samples, 2 * F))

    entry_buf0 = jnp.zeros((B, K, Q))
    layer_bufs0 = tuple(jnp.zeros((B, d * (K - 1) + 1, F))
                        for _, d in specs)
    prev0 = jnp.full((B,), Q // 2, jnp.int32)

    w_dil = [jnp.asarray(p[n + "_dilated"]["kernel"]) for n, _ in specs]
    b_dil = [jnp.asarray(p[n + "_dilated"]["bias"]) for n, _ in specs]
    w_res = [jnp.asarray(p[n + "_res"]["kernel"])[0] for n, _ in specs]
    b_res = [jnp.asarray(p[n + "_res"]["bias"]) for n, _ in specs]
    w_skip = [jnp.asarray(p[n + "_skip"]["kernel"])[0] for n, _ in specs]
    b_skip = [jnp.asarray(p[n + "_skip"]["bias"]) for n, _ in specs]
    w_p1 = jnp.asarray(p["post1"]["kernel"])[0]
    b_p1 = jnp.asarray(p["post1"]["bias"])
    w_p2 = jnp.asarray(p["post2"]["kernel"])[0]
    b_p2 = jnp.asarray(p["post2"]["bias"])

    def step(carry, inp):
        prev, entry_buf, layer_bufs, key = carry
        cond_t = inp                                 # (L, B, 2F)
        x = jax.nn.one_hot(prev, Q)
        entry_buf = jnp.concatenate([entry_buf[:, 1:], x[:, None]],
                                    axis=1)
        h = jnp.einsum("bkq,kqf->bf", entry_buf, entry_k) + entry_b
        skips = jnp.zeros((B, F))
        new_bufs = []
        for i, (_, d) in enumerate(specs):
            buf = jnp.concatenate([layer_bufs[i][:, 1:], h[:, None]],
                                  axis=1)
            new_bufs.append(buf)
            taps = buf[:, ::d]                       # (B, K, F)
            g = (jnp.einsum("bkf,kfg->bg", taps, w_dil[i]) + b_dil[i] +
                 cond_t[i])
            filt, gate = jnp.split(g, 2, axis=-1)
            z = jnp.tanh(filt) * jax.nn.sigmoid(gate)
            h = h + z @ w_res[i] + b_res[i]
            skips = skips + z @ w_skip[i] + b_skip[i]
        out = jax.nn.relu(skips) @ w_p1 + b_p1
        logits = jax.nn.relu(out) @ w_p2 + b_p2      # (B, Q)
        key, sub = jax.random.split(key)
        if temperature > 0.0:
            nxt = jax.random.categorical(sub, logits / temperature,
                                         axis=-1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, entry_buf, tuple(new_bufs), key), (nxt, logits)

    xs = jnp.moveaxis(cond_proj, 2, 0)               # (T, L, B, 2F)
    _, (ids, logits) = jax.lax.scan(
        step, (prev0, entry_buf0, layer_bufs0, rng), xs)
    ids = jnp.moveaxis(ids, 0, 1)                    # (B, T)
    return ids, mu_law_decode(ids, Q), jnp.moveaxis(logits, 0, 1)


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
