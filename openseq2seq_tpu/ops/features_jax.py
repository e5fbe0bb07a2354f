"""On-device speech featurization (the BASELINE.json north star: the
host librosa STFT/mel pipeline moved onto the TPU).

Batched, jittable log-mel / log-magnitude extraction matching the host
reference in ``ops/features.py`` (same framing, symmetric hann window,
Slaney mel filterbank, per-utterance normalization):

  * framing is a gather with a precomputed index matrix — XLA lowers it
    to an efficient dynamic-slice loop;
  * the FFT runs on-device (XLA TPU FFT); the mel projection is one
    (B*T, 1+nfft/2) x (1+nfft/2, M) MXU matmul;
  * normalization is masked by true signal length so padded batches
    match the host's per-utterance statistics.

This turns featurization from a host bottleneck (the reference's
``tf.py_func``, `docs/speech-commands.rst:28`) into ~free device work
overlapped with the input pipeline.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .features import mel_filterbank


@functools.partial(jax.jit, static_argnames=(
    "sample_freq", "num_features", "n_fft", "hop_length", "win_length",
    "norm_per_feature", "preemph"))
def logmel_features(signals: jax.Array,
                    signal_lengths: jax.Array,
                    sample_freq: int = 16000,
                    num_features: int = 64,
                    n_fft: int = 512,
                    hop_length: int = 160,
                    win_length: int = 320,
                    norm_per_feature: bool = True,
                    preemph: float = 0.97
                    ) -> Tuple[jax.Array, jax.Array]:
    """signals (B, N) float in [-1, 1]; returns (features (B, T, M),
    feature_lengths (B,)). Matches the host 'logfbank' path."""
    B, N = signals.shape

    # per-utterance gain normalization (masked max)
    mask = (jnp.arange(N)[None, :] < signal_lengths[:, None])
    sig = signals * mask
    peak = jnp.max(jnp.abs(sig), axis=1, keepdims=True)
    sig = sig / (peak + 1e-5)

    # preemphasis
    sig = jnp.concatenate([sig[:, :1],
                           sig[:, 1:] - preemph * sig[:, :-1]], axis=1)

    # centered framing with reflect padding
    pad = n_fft // 2
    padded = jnp.pad(sig, ((0, 0), (pad, pad)), mode="reflect")
    T = 1 + N // hop_length
    idx = (np.arange(n_fft)[None, :] +
           hop_length * np.arange(T)[:, None])          # (T, n_fft)
    frames = padded[:, idx]                              # (B, T, n_fft)

    window = np.hanning(win_length)
    if win_length < n_fft:
        w_pad = n_fft - win_length
        window = np.pad(window, (w_pad // 2, w_pad - w_pad // 2))
    frames = frames * jnp.asarray(window, frames.dtype)[None, None, :]

    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    power = spec.real ** 2 + spec.imag ** 2                # (B, T, F)

    fb = jnp.asarray(mel_filterbank(sample_freq, n_fft,
                                    n_mels=num_features))  # (M, F)
    mel = jnp.einsum("btf,mf->btm", power, fb)
    feats = jnp.log(mel + 1e-20)

    feat_lengths = 1 + signal_lengths // hop_length
    tmask = (jnp.arange(T)[None, :] <
             feat_lengths[:, None]).astype(jnp.float32)    # (B, T)
    denom = jnp.maximum(jnp.sum(tmask, axis=1), 1.0)

    if norm_per_feature:
        mean = jnp.sum(feats * tmask[:, :, None], axis=1) / denom[:, None]
        var = jnp.sum(((feats - mean[:, None, :]) ** 2) *
                      tmask[:, :, None], axis=1) / denom[:, None]
        feats = (feats - mean[:, None, :]) * \
            jax.lax.rsqrt(var + 1e-12)[:, None, :]
    else:
        total = denom * num_features
        mean = jnp.sum(feats * tmask[:, :, None], axis=(1, 2)) / total
        var = jnp.sum(((feats - mean[:, None, None]) ** 2) *
                      tmask[:, :, None], axis=(1, 2)) / total
        feats = (feats - mean[:, None, None]) * \
            jax.lax.rsqrt(var + 1e-12)[:, None, None]

    feats = feats * tmask[:, :, None]
    return feats, feat_lengths
