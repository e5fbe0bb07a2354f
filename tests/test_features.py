import numpy as np
import pytest

from openseq2seq_tpu.ops.features import (get_speech_features,
                                          mel_filterbank, normalize_signal,
                                          preemphasis, stft_power)


def test_normalize_signal_range():
    sig = np.array([0.5, -2.0, 1.0], np.float32)
    out = normalize_signal(sig)
    assert np.max(np.abs(out)) <= 1.0
    assert np.max(np.abs(out)) == pytest.approx(1.0, rel=1e-3)


def test_preemphasis():
    sig = np.array([1.0, 2.0, 3.0], np.float32)
    out = preemphasis(sig, coeff=0.9)
    np.testing.assert_allclose(out, [1.0, 2.0 - 0.9, 3.0 - 1.8], rtol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, n_mels=40)
    assert fb.shape == (40, 257)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=1) > 0)
    # filters are ordered in frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)


def test_stft_power_frame_count():
    sr = 16000
    sig = np.random.RandomState(0).randn(sr).astype(np.float32)  # 1 s
    hop = 160
    spec = stft_power(sig, n_fft=320, hop_length=hop, win_length=320)
    assert spec.shape[0] == 161
    # centered stft: 1 + len/hop frames
    assert spec.shape[1] == 1 + len(sig) // hop


def test_stft_parseval_sanity():
    """Energy of a pure tone concentrates at its bin."""
    sr, f = 16000, 1000
    t = np.arange(sr) / sr
    sig = np.sin(2 * np.pi * f * t).astype(np.float32)
    spec = stft_power(sig, n_fft=512, hop_length=256, win_length=512)
    mean_spec = spec.mean(axis=1)
    peak_bin = np.argmax(mean_spec)
    expected_bin = round(f * 512 / sr)
    assert abs(int(peak_bin) - expected_bin) <= 1


@pytest.mark.parametrize("input_type,num_feat", [
    ("spectrogram", 96), ("logfbank", 64), ("mfcc", 13)])
def test_get_speech_features_shapes(input_type, num_feat):
    sr = 16000
    rng = np.random.RandomState(0)
    sig = rng.randn(sr // 2).astype(np.float32)
    params = {"num_audio_features": num_feat, "input_type": input_type,
              "sample_freq": sr}
    feats, duration = get_speech_features(sig, sr, params, rng=rng)
    assert feats.shape[1] == num_feat
    assert feats.dtype == np.float32
    assert duration == pytest.approx(0.5)
    # normalized: global mean ~0, std ~1
    assert abs(np.mean(feats)) < 0.1
    assert np.std(feats) == pytest.approx(1.0, rel=0.1)


def test_norm_per_feature():
    sr = 16000
    rng = np.random.RandomState(1)
    sig = rng.randn(sr).astype(np.float32)
    params = {"num_audio_features": 32, "input_type": "logfbank",
              "sample_freq": sr, "norm_per_feature": True}
    feats, _ = get_speech_features(sig, sr, params, rng=rng)
    np.testing.assert_allclose(feats.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(feats.std(axis=0), 1.0, atol=1e-3)


def test_spec_augment_masks_applied():
    sr = 16000
    rng = np.random.RandomState(2)
    sig = rng.randn(sr).astype(np.float32)
    params = {"num_audio_features": 32, "input_type": "logfbank",
              "sample_freq": sr,
              "augmentation": {"n_freq_mask": 2, "n_time_mask": 2,
                               "width_freq_mask": 6, "width_time_mask": 10}}
    feats, _ = get_speech_features(sig, sr, params, rng=rng)
    # at least one exact-zero column or row band should exist
    assert (np.any(np.all(feats == 0, axis=0)) or
            np.any(np.all(feats == 0, axis=1)))


def test_speed_perturbation_changes_length():
    sr = 16000
    rng = np.random.RandomState(3)
    sig = rng.randn(sr).astype(np.float32)
    params = {"num_audio_features": 32, "input_type": "logfbank",
              "sample_freq": sr,
              "augmentation": {"speed_perturbation_ratio": [1.5]}}
    feats, dur = get_speech_features(sig, sr, params, rng=rng)
    base_params = {"num_audio_features": 32, "input_type": "logfbank",
                   "sample_freq": sr}
    base_feats, base_dur = get_speech_features(sig, sr, base_params, rng=rng)
    assert feats.shape[0] != base_feats.shape[0]


def test_parallel_augmented_featurization_deterministic(toy_speech_data):
    """Augmented featurization must give identical batches whether the
    thread pool runs 1 or 8 workers (per-example RNG seeded by
    (seed, epoch, index) — replaces the shared-RNG design that forced
    single-threaded pipelines on augmented recipes)."""
    from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer

    def batches(workers):
        dl = Speech2TextDataLayer({
            "mode": "train", "batch_size": 4, "shuffle": False,
            "num_audio_features": 24, "input_type": "logfbank",
            "vocab_file": toy_speech_data["vocab"],
            "dataset_files": [toy_speech_data["csv"]],
            "sample_freq": 16000, "dither": 1e-3,
            "map_parallel_calls": workers,
            "augmentation": {"n_freq_mask": 1, "n_time_mask": 1,
                             "width_freq_mask": 4, "width_time_mask": 4},
        }, model=None)
        dl.seed(7)
        return list(dl.iterate_one_epoch())

    b1, b8 = batches(1), batches(8)
    assert len(b1) == len(b8) > 0
    for x, y in zip(b1, b8):
        np.testing.assert_array_equal(x["source_tensors"][0],
                                      y["source_tensors"][0])


def test_process_pool_featurization_matches_threads(toy_speech_data):
    """use_process_pool=True (forked featurizer workers — the numpy
    featurizer is GIL-bound so threads cannot scale it) must produce
    exactly the thread-path batches."""
    from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer

    def batches(use_pool):
        dl = Speech2TextDataLayer({
            "mode": "train", "batch_size": 4, "shuffle": False,
            "num_audio_features": 24, "input_type": "logfbank",
            "vocab_file": toy_speech_data["vocab"],
            "dataset_files": [toy_speech_data["csv"]],
            "sample_freq": 16000, "dither": 1e-3,
            "map_parallel_calls": 4,
            "use_process_pool": use_pool,
            "augmentation": {"n_freq_mask": 1, "n_time_mask": 1,
                             "width_freq_mask": 4, "width_time_mask": 4},
        }, model=None)
        dl.seed(7)
        return list(dl.iterate_one_epoch())

    bt, bp = batches(False), batches(True)
    assert len(bt) == len(bp) > 0
    for x, y in zip(bt, bp):
        np.testing.assert_array_equal(x["source_tensors"][0],
                                      y["source_tensors"][0])
        np.testing.assert_array_equal(x["target_tensors"][0],
                                      y["target_tensors"][0])


def test_feature_cache_with_masks_only_augmentation(toy_speech_data,
                                                    tmp_path):
    """Masks-only (SpecAugment) augmentation is cache-compatible: base
    features are cached once and masks are drawn per epoch on load —
    this is what lets the flagship Jasper/QuartzNet recipes train from
    cache on hosts without featurizer cores. Checks: (a) cached batches
    are identical to a fresh warm-cache run (mask seed independent of
    cache state), (b) masks differ across epochs, (c) disabling masks
    reproduces the plain cached features."""
    import glob
    from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer

    cache_dir = str(tmp_path / "feat_cache")
    aug = {"n_freq_mask": 1, "n_time_mask": 1,
           "width_freq_mask": 4, "width_time_mask": 4}

    def make(augmentation):
        dl = Speech2TextDataLayer({
            "mode": "train", "batch_size": 4, "shuffle": False,
            "num_audio_features": 24, "input_type": "logfbank",
            "vocab_file": toy_speech_data["vocab"],
            "dataset_files": [toy_speech_data["csv"]],
            "sample_freq": 16000, "dither": 1e-3,
            "cache_features": True, "cache_format": cache_dir,
            "augmentation": augmentation,
        }, model=None)
        dl.seed(7)
        return dl

    dl = make(aug)
    cold = list(dl.iterate_one_epoch())           # populates the cache
    assert glob.glob(cache_dir + "/*.npz"), "cache not written"
    dl2 = make(aug)
    warm = list(dl2.iterate_one_epoch())          # pure cache hits
    for x, y in zip(cold, warm):
        np.testing.assert_array_equal(x["source_tensors"][0],
                                      y["source_tensors"][0])

    dl3 = make(aug)
    dl3.seed(8)                                    # different epoch seed
    other = list(dl3.iterate_one_epoch())
    assert any(
        not np.array_equal(x["source_tensors"][0], y["source_tensors"][0])
        for x, y in zip(warm, other)), "masks did not vary across epochs"

    plain = list(make({}).iterate_one_epoch())
    masked_cells = [
        np.mean(x["source_tensors"][0] != y["source_tensors"][0])
        for x, y in zip(warm, plain)]
    assert 0 < np.mean(masked_cells) < 0.6, masked_cells


def test_syn_enable_substitutes_random_subdir(toy_speech_data, tmp_path):
    """syn_enable: CSV wav paths are '{}' templates; each load picks a
    random syn_subdirs rendition (reference speech2text.py:421-422).
    Distinguishable wavs per subdir prove real substitution, and the
    thread/process paths must agree."""
    import os
    import shutil
    from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
    from openseq2seq_tpu.test_utils import toy_speech

    # two synthetic renditions: same transcripts, different noise seeds
    for sub, seed in (("synA", 1), ("synB", 2)):
        toy_speech.generate(str(tmp_path / sub), seed=seed, noise=0.05)
    # template CSV pointing into {} subdirs
    rows = ["wav_filename,wav_filesize,transcript"]
    with open(toy_speech_data["csv"]) as f:
        next(f)
        for line in f:
            wav, size, text = line.strip().split(",")
            rows.append("{},{},{}".format(
                os.path.join(str(tmp_path), "{}",
                             os.path.basename(wav)), size, text))
    csv = tmp_path / "syn.csv"
    csv.write_text("\n".join(rows) + "\n")

    def batches(use_pool, seed=11):
        dl = Speech2TextDataLayer({
            "mode": "train", "batch_size": 4, "shuffle": False,
            "num_audio_features": 24, "input_type": "logfbank",
            "vocab_file": toy_speech_data["vocab"],
            "dataset_files": [str(csv)],
            "sample_freq": 16000,
            "syn_enable": True,
            "syn_subdirs": ["synA", "synB"],
            "use_process_pool": use_pool,
        }, model=None)
        dl.seed(seed)
        return list(dl.iterate_one_epoch())

    bt = batches(False)
    assert len(bt) > 0
    # thread and process pools draw the same renditions + features
    for x, y in zip(bt, batches(True)):
        np.testing.assert_array_equal(x["source_tensors"][0],
                                      y["source_tensors"][0])
    # different layer seeds pick different renditions (features differ)
    other = batches(False, seed=12)
    assert any(
        x["source_tensors"][0].shape != y["source_tensors"][0].shape
        or not np.array_equal(x["source_tensors"][0],
                              y["source_tensors"][0])
        for x, y in zip(bt, other))


def test_syn_enable_requires_subdirs(toy_speech_data):
    from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer
    with pytest.raises(ValueError, match="syn_subdirs"):
        Speech2TextDataLayer({
            "mode": "train", "batch_size": 4, "shuffle": False,
            "num_audio_features": 24, "input_type": "logfbank",
            "vocab_file": toy_speech_data["vocab"],
            "dataset_files": [toy_speech_data["csv"]],
            "sample_freq": 16000,
            "syn_enable": True,
        }, model=None)
