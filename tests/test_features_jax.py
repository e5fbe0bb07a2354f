"""On-device featurization must match the host numpy reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from openseq2seq_tpu.ops.features import get_speech_features
from openseq2seq_tpu.ops.features_jax import logmel_features


def test_jax_logmel_matches_host():
    sr = 16000
    rng = np.random.RandomState(0)
    n = sr  # 1 s
    t = np.arange(n) / sr
    sig = (np.sin(2 * np.pi * 440 * t) +
           0.3 * np.sin(2 * np.pi * 1330 * t) +
           0.01 * rng.randn(n)).astype(np.float32)

    host_params = {
        "num_audio_features": 40,
        "input_type": "logfbank",
        "sample_freq": sr,
        "norm_per_feature": True,
        "window": "hanning",
        "num_fft": 512,
    }
    host_feats, _ = get_speech_features(sig, sr, host_params, rng=rng)

    dev_feats, dev_len = logmel_features(
        jnp.asarray(sig)[None, :], jnp.asarray([n]),
        sample_freq=sr, num_features=40, n_fft=512,
        hop_length=160, win_length=320, norm_per_feature=True)
    dev = np.asarray(dev_feats)[0, :int(dev_len[0])]

    T = min(dev.shape[0], host_feats.shape[0])
    # same framing; normalized features must agree closely
    np.testing.assert_allclose(dev[:T], host_feats[:T], atol=0.08,
                               rtol=0.05)


def test_jax_logmel_batch_padding_invariance():
    """A padded batch entry must produce (nearly) the same features as
    the unpadded single decode. The single boundary frame at the true
    signal end sees batch zero-padding instead of reflect padding and
    slightly shifts the per-utterance stats — negligible for real
    utterance lengths, so test with multi-second signals."""
    sr = 16000
    rng = np.random.RandomState(1)
    n2 = 3 * sr
    sig1 = rng.randn(4 * sr).astype(np.float32)
    sig2 = rng.randn(n2).astype(np.float32)
    batch = np.zeros((2, 4 * sr), np.float32)
    batch[0] = sig1
    batch[1, :n2] = sig2
    feats, lens = logmel_features(jnp.asarray(batch),
                                  jnp.asarray([4 * sr, n2]),
                                  num_features=32, n_fft=512,
                                  hop_length=160, win_length=320)
    solo, solo_len = logmel_features(jnp.asarray(sig2)[None],
                                     jnp.asarray([n2]),
                                     num_features=32, n_fft=512,
                                     hop_length=160, win_length=320)
    n = int(solo_len[0])
    interior = n - 512 // 160 - 1
    np.testing.assert_allclose(np.asarray(feats)[1, :interior],
                               np.asarray(solo)[0, :interior],
                               atol=0.05, rtol=0.05)
