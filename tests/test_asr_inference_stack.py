"""End-to-end ASR inference stack: streaming FrameASR, logits dump +
offline decode.py grid search with LM (the reference's
`frame_asr.py` / `scripts/decode.py` flows)."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

from openseq2seq_tpu.models import Speech2Text
from openseq2seq_tpu.test_utils import toy_speech
from openseq2seq_tpu.test_utils.test_speech_configs import w2l_test_config
from openseq2seq_tpu.training import trainer


def _corpus_feature_stats(data_dir, base_params):
    """Fixed per-feature normalization stats over the toy corpus — the
    streaming-correct recipe (per-utterance stats don't exist in a
    stream; reference's calibrate flow serves the same purpose)."""
    from openseq2seq_tpu.ops.features import get_speech_features_from_file
    params = dict(base_params["data_layer_params"])
    params["features_mean"] = 0.0
    params["features_std_dev"] = 1.0
    feats = []
    for i in range(10):
        path = os.path.join(data_dir, "toy_{}.wav".format(i))
        f, _ = get_speech_features_from_file(path, params)
        feats.append(f)
    allf = np.concatenate(feats, axis=0)
    return allf.mean(axis=0), allf.std(axis=0) + 1e-6


@pytest.fixture(scope="module")
def trained_toy_asr(tmp_path_factory):
    out = tmp_path_factory.mktemp("asr_stack")
    csv, vocab = toy_speech.generate(str(out / "data"))
    logdir = str(out / "logs")
    base_params, _ = w2l_test_config(csv, vocab, logdir=logdir,
                                     num_epochs=150)
    mean, std = _corpus_feature_stats(str(out / "data"), base_params)
    base_params["data_layer_params"]["features_mean"] = mean
    base_params["data_layer_params"]["features_std_dev"] = std
    base_params["save_checkpoint_steps"] = 150
    model = Speech2Text(params=base_params, mode="train")
    trainer.train(model)
    ckpt = os.path.join(logdir, "checkpoints", "150")
    assert os.path.isdir(ckpt)
    return {"csv": csv, "vocab": vocab, "logdir": logdir, "ckpt": ckpt,
            "dir": str(out), "mean": mean, "std": std}


def _build_model(toy, mode, **overrides):
    base_params, _ = w2l_test_config(toy["csv"], toy["vocab"],
                                     num_epochs=150)
    base_params["data_layer_params"]["features_mean"] = toy["mean"]
    base_params["data_layer_params"]["features_std_dev"] = toy["std"]
    from openseq2seq_tpu.utils.params import nested_update
    nested_update(base_params, overrides)
    return Speech2Text(params=base_params, mode=mode)


def test_frame_asr_streaming(trained_toy_asr):
    from openseq2seq_tpu.apps.frame_asr import FrameASR
    model = _build_model(trained_toy_asr, "interactive_infer")
    # toy featurizer: 10ms hop, no stride -> 0.01 s per logit step
    asr = FrameASR(model, checkpoint=trained_toy_asr["ckpt"],
                   frame_len=0.2, frame_overlap=0.4,
                   timestep_duration=0.01, beam_width=1)
    sr, signal = wavfile.read(
        os.path.join(trained_toy_asr["dir"], "data", "toy_0.wav"))
    signal = signal.astype(np.float32) / 32767.0
    n = asr.n_frame_len
    pad = (-len(signal)) % n
    rng = np.random.RandomState(7)
    signal = np.concatenate(
        [signal, (rng.randn(pad) * 1e-3).astype(np.float32)])
    text = ""
    for i in range(0, len(signal), n):
        text += asr.transcribe(signal[i:i + n])
    text += asr.flush()
    # toy_0 transcript is "abc bca" — streaming decode should recover
    # most of it (boundary effects may drop edge chars)
    from openseq2seq_tpu.utils.metrics import levenshtein
    assert levenshtein(list("abc bca"), list(text.strip())) <= 3, text


def test_logits_dump_and_offline_decode(trained_toy_asr, tmp_path):
    # 1) dump logits via infer
    model = _build_model(trained_toy_asr, "infer",
                         decoder_params={"infer_logits_to_pickle": True})
    dump = str(tmp_path / "logits.pkl")
    trainer.infer(model, trained_toy_asr["ckpt"], dump)
    with open(dump, "rb") as f:
        logits_map = pickle.load(f)
    assert len(logits_map) == 10
    # 2) build an LM from the toy transcripts
    from openseq2seq_tpu.ops.arpa_lm import build_arpa
    lm_path = str(tmp_path / "toy.arpa")
    build_arpa([t.split() for t in toy_speech.TRANSCRIPTS], lm_path,
               order=2)
    # 3) offline grid search via the script CLI
    out_csv = str(tmp_path / "decoded.csv")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "scripts/decode.py", "--logits", dump,
         "--labels", trained_toy_asr["csv"], "--vocab",
         trained_toy_asr["vocab"], "--lm", lm_path,
         "--alpha", "0.5", "--alpha_max", "1.5", "--alpha_step", "1.0",
         "--beta", "0.0", "--beam_width", "16",
         "--infer_output_file", out_csv],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert proc.returncode == 0, proc.stderr
    assert "BEST:" in proc.stdout
    # the trained toy model is near-perfect: best WER must be tiny
    best_line = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("BEST:")][0]
    wer = float(best_line.rsplit("WER=", 1)[1])
    assert wer < 0.2, proc.stdout
    assert os.path.exists(out_csv)
