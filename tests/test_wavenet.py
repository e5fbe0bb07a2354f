"""WaveNet vocoder track: mu-law codec, gated dilated conv net, loss,
data layer."""
import numpy as np
import pytest
from scipy.io import wavfile

import jax.numpy as jnp

from openseq2seq_tpu.data.text2speech import WavenetDataLayer
from openseq2seq_tpu.decoders import FakeDecoder
from openseq2seq_tpu.encoders import WavenetEncoder
from openseq2seq_tpu.encoders.wavenet_encoder import (mu_law_decode,
                                                      mu_law_encode)
from openseq2seq_tpu.losses import WavenetLoss
from openseq2seq_tpu.models import Text2SpeechWavenet
from openseq2seq_tpu.training import trainer


def test_mu_law_roundtrip():
    x = jnp.asarray(np.linspace(-0.95, 0.95, 64), jnp.float32)
    ids = mu_law_encode(x, 256)
    assert int(ids.min()) >= 0 and int(ids.max()) < 256
    decoded = mu_law_decode(ids, 256)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(x),
                               atol=0.02)


@pytest.fixture(scope="module")
def toy_wavenet_data(tmp_path_factory):
    out = tmp_path_factory.mktemp("wavenet")
    wav_dir = out / "wavs"
    wav_dir.mkdir()
    sr = 16000
    rows = []
    for i in range(4):
        t = np.arange(sr // 2) / sr
        sig = np.sin(2 * np.pi * (200 + 100 * i) * t)
        wavfile.write(str(wav_dir / "w{}.wav".format(i)), sr,
                      (sig * 0.8 * 32767).astype(np.int16))
        rows.append("w{}|text{}|text{}".format(i, i, i))
    (out / "meta.csv").write_text("\n".join(rows) + "\n")
    (out / "vocab.txt").write_text("t\ne\nx\n0\n1\n2\n3\n")
    return str(out)


def _config(data_dir, num_epochs=1):
    return {
        "random_seed": 0,
        "num_epochs": num_epochs,
        "logdir": "",
        "batch_size_per_gpu": 2,
        "print_loss_steps": 2,
        "save_checkpoint_steps": None,
        "optimizer": "Adam",
        "optimizer_params": {"learning_rate": 1e-3},
        "encoder": WavenetEncoder,
        "encoder_params": {
            "layer_type": "conv1d",
            "kernel_size": 3,
            "strides": 1,
            "padding": "SAME",
            "blocks": 2,
            "layers_per_block": 3,
            "filters": 16,
            "quantization_channels": 64,
        },
        "decoder": FakeDecoder,
        "decoder_params": {},
        "loss": WavenetLoss,
        "loss_params": {},
        "data_layer": WavenetDataLayer,
        "data_layer_params": {
            "dataset_location": data_dir,
            "dataset": "LJ",
            "num_audio_features": 20,
            "output_type": "mel",
            "vocab_file": data_dir + "/vocab.txt",
            "dataset_files": [data_dir + "/meta.csv"],
            "feature_normalize": False,
            "n_fft": 256,
            "sample_freq": 16000,
            "num_samples": 2048,
        },
    }


def test_wavenet_data_layer(toy_wavenet_data):
    model = Text2SpeechWavenet(params=_config(toy_wavenet_data),
                               mode="train")
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    audio, audio_len, mel = batch["source_tensors"]
    assert audio.shape[0] == 2
    assert audio.shape[1] % 256 == 0
    assert mel.shape[2] == 20


def test_wavenet_train_step_causality(toy_wavenet_data):
    import jax
    model = Text2SpeechWavenet(params=_config(toy_wavenet_data),
                               mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    _, metrics = jax.jit(model.train_step)(state, device_batch,
                                           jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    # untrained CE should be near log(Q)
    assert abs(loss - np.log(64)) < 1.0

    # causality: changing future samples must not change current logits
    variables = {"params": state.params, **state.model_state}
    out1 = model.module().apply(variables, device_batch, train=False)
    batch2 = jax.tree_util.tree_map(np.copy, device_batch)
    batch2["source_tensors"][0][:, 1500:] += 0.3   # perturb the future
    out2 = model.module().apply(variables, batch2, train=False)
    l1 = np.asarray(out1["decoder_output"]["logits"])[:, :1000]
    l2 = np.asarray(out2["decoder_output"]["logits"])[:, :1000]
    np.testing.assert_allclose(l1, l2, atol=1e-4)


@pytest.mark.slow
def test_wavenet_loss_decreases(toy_wavenet_data):
    model = Text2SpeechWavenet(params=_config(toy_wavenet_data,
                                              num_epochs=100),
                               mode="train")
    result = trainer.train(model)
    assert float(result["last_metrics"]["loss"]) < 3.0


def test_wavenet_fast_generation_matches_parallel(toy_wavenet_data):
    """Fast-WaveNet queue generation == teacher-forcing the generated
    sequence through the parallel conv net (exact same logits)."""
    import jax
    from openseq2seq_tpu.encoders.wavenet_encoder import wavenet_generate

    model = Text2SpeechWavenet(params=_config(toy_wavenet_data),
                               mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)

    ep = model.params["encoder_params"]
    mel = device_batch["source_tensors"][2][:, :8]    # (B, 8, 20)
    n = 64
    ids, audio, gen_logits = jax.jit(
        lambda p, c: wavenet_generate(
            p, n, blocks=ep["blocks"],
            layers_per_block=ep["layers_per_block"],
            kernel_size=ep["kernel_size"],
            quantization_channels=ep["quantization_channels"],
            conditioning=c, batch_size=2))(
                state.params["enc"]["net"], mel)
    assert ids.shape == (2, n) and audio.shape == (2, n)

    # teacher-force the generated waveform through the parallel net
    variables = {"params": state.params, **state.model_state}
    par_batch = dict(device_batch)
    par_batch["source_tensors"] = [np.asarray(audio),
                                   np.full((2,), n, np.int32),
                                   np.asarray(mel)]
    out = model.module().apply(variables, par_batch, train=False)
    par_logits = np.asarray(out["encoder_output"]["logits"])
    np.testing.assert_allclose(np.asarray(gen_logits), par_logits,
                               atol=2e-4, rtol=1e-3)
    # and the mu-law round trip preserved the ids the net saw
    np.testing.assert_array_equal(
        np.asarray(out["encoder_output"]["labels"]), np.asarray(ids))

    # model-level API
    wav = model.generate(state, conditioning=mel, n_samples=32)
    assert wav.shape == (2, 32) and np.all(np.isfinite(wav))
