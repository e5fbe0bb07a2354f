"""Construct-check the whole example_configs zoo: every non-toy config
must build its REAL model + data layer against tiny fixture datasets,
pass check_params in every component ctor, produce a real batch, and
abstractly trace (jax.eval_shape) init_state + train_step — so a typo'd
param name or a shape bug in any recipe fails CI without a full run.

(The reference's de facto public API is its config zoo; parse-only
checks — test_example_configs.py — can't catch schema or shape bugs
because ctors never run there.)
"""
import glob
import os
import runpy

import numpy as np
import pytest

import jax

from openseq2seq_tpu.test_utils import toy_nmt, toy_speech, toy_tts
from openseq2seq_tpu.utils.params import nested_update

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "example_configs", "*",
                                        "*.py")))
# toy configs construct themselves end-to-end in the CLI tests
ZOO = [c for c in CONFIGS if "toy" not in os.path.basename(c)]


@pytest.fixture(scope="module")
def zoo_data(tmp_path_factory):
    """Tiny on-disk datasets in each layout the zoo's data layers read."""
    base = tmp_path_factory.mktemp("zoo_data")
    data = {}

    # --- speech2text: LibriSpeech-style CSV + char vocab
    sp_dir = str(base / "speech")
    csv, vocab = toy_speech.generate(sp_dir)
    data["speech_csv"], data["speech_vocab"] = csv, vocab

    # --- speech_commands: 1-second wavs + "path,label" CSV
    from scipy.io import wavfile
    cmd_dir = base / "commands"
    (cmd_dir / "wavs").mkdir(parents=True)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(8):
        sig = (rng.randn(16000) * 0.1 * 32767).astype(np.int16)
        wavfile.write(str(cmd_dir / "wavs" / "c{}.wav".format(i)),
                      16000, sig)
        rows.append("wavs/c{}.wav,{}".format(i, i % 4))
    with open(cmd_dir / "split.csv", "w") as f:
        f.write("\n".join(rows) + "\n")
    data["commands_dir"] = str(cmd_dir)
    data["commands_csv"] = str(cmd_dir / "split.csv")

    # --- text2text: token-parallel corpus + vocab
    data["nmt"] = toy_nmt.generate(str(base / "nmt"))

    # --- text2text via T2T records: tiny synthetic WMT with the
    # wordpiece vocab + tfrecord shards (transformer-big-t2t.py)
    from openseq2seq_tpu.test_utils import fake_wmt
    data["wmt_dir"] = fake_wmt.generate(
        str(base / "wmt"), n_train=200, n_dev=16, n_test=16,
        n_types=64, with_t2t=True)

    # --- lm: WikiText-style data_root
    lm_dir = base / "lm"
    lm_dir.mkdir()
    sent = "the cat sat on the mat and the dog ran\n"
    for split in ("train", "valid", "test"):
        with open(lm_dir / "{}.txt".format(split), "w") as f:
            f.write(sent * 50)
    data["lm_root"] = str(lm_dir)
    data["lm_processed"] = str(base / "lm_processed")

    # --- transfer: IMDB directory layout + SST tsv + shared vocab
    imdb = base / "imdb"
    for split in ("train", "test"):
        for sub in ("pos", "neg"):
            d = imdb / split / sub
            d.mkdir(parents=True)
            for i in range(3):
                with open(d / "{}.txt".format(i), "w") as f:
                    f.write("the cat sat on the mat\n")
    data["imdb_root"] = str(imdb)
    sst = base / "sst"
    sst.mkdir()
    for split in ("train", "dev", "test"):
        with open(sst / "{}.tsv".format(split), "w") as f:
            f.write("sentence\tlabel\n")
            for i in range(6):
                f.write("the cat sat on the mat\t{}\n".format(i % 2))
    data["sst_root"] = str(sst)
    lm_vocab = base / "lm_vocab.txt"
    with open(lm_vocab, "w") as f:
        for w in ["<unk>", "<eos>", "the", "cat", "sat", "on", "mat",
                  "and", "dog", "ran"]:
            f.write(w + "\n")
    data["lm_vocab"] = str(lm_vocab)

    # --- text2speech: LJ-style metadata.csv + wavs + char vocab
    tts_dir = str(base / "tts")
    data["tts_csv"] = toy_tts.generate(tts_dir)
    data["tts_dir"] = tts_dir
    data["tts_vocab"] = os.path.join(tts_dir, "vocab.txt")

    # --- image2label: imagenet folder tree + CIFAR bins
    from PIL import Image
    img_root = base / "imagenet"
    for split in ("train", "val"):
        for cls in ("n01", "n02"):
            d = img_root / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
                Image.fromarray(arr).save(d / "{}.jpeg".format(i))
    data["imagenet_dir"] = str(img_root)

    cifar_dir = base / "cifar"
    cifar_dir.mkdir()
    for name, n in [("data_batch_1.bin", 12), ("test_batch.bin", 6)]:
        recs = []
        for i in range(n):
            recs.append(bytes([i % 10]) +
                        rng.randint(0, 255, 3072, np.uint8).tobytes())
        with open(cifar_dir / name, "wb") as f:
            f.write(b"".join(recs))
    data["cifar_dir"] = str(cifar_dir)
    return data


def _data_overrides(layer_name, zoo, params):
    """Point a config's data layer at the fixture data; shrink batch."""
    dl = {}
    if layer_name == "Speech2TextDataLayer":
        dl = {"dataset_files": [zoo["speech_csv"]],
              "vocab_file": zoo["speech_vocab"],
              "max_duration": 1000.0, "min_duration": -1.0,
              "cache_features": False}
    elif layer_name == "SpeechCommandsDataLayer":
        dl = {"dataset_files": [zoo["commands_csv"]],
              "dataset_location": zoo["commands_dir"],
              "num_labels": 4}
    elif layer_name == "ParallelTextDataLayer":
        nmt = zoo["nmt"]
        dl = {"source_file": nmt["train_src"],
              "target_file": nmt["train_tgt"],
              "src_vocab_file": nmt["vocab"],
              "tgt_vocab_file": nmt["vocab"],
              "max_length": 16}
    elif layer_name == "TransformerDataLayer":
        t2t = os.path.join(zoo["wmt_dir"], "t2t")
        vocab = os.path.join(t2t, "vocab.ende.sub")
        with open(vocab, encoding="utf-8") as f:
            vs = sum(1 for _ in f)
        dl = {"data_dir": t2t, "file_pattern": "train-*.tfrecord",
              "src_vocab_size": vs, "vocab_file": vocab,
              "max_length": 16}
    elif layer_name == "WKTDataLayer":
        dl = {"data_root": zoo["lm_root"],
              "processed_data_folder": zoo["lm_processed"],
              "bptt": 12}
    elif layer_name in ("IMDBDataLayer", "SSTDataLayer"):
        root = zoo["imdb_root"] if layer_name == "IMDBDataLayer" \
            else zoo["sst_root"]
        dl = {"data_root": root, "lm_vocab_file": zoo["lm_vocab"],
              "max_length": 16,
              "processed_data_folder": zoo["lm_processed"]}
    elif layer_name in ("Text2SpeechDataLayer", "WavenetDataLayer"):
        dl = {"dataset_files": [zoo["tts_csv"]],
              "dataset_location": zoo["tts_dir"],
              "vocab_file": zoo["tts_vocab"]}
    elif layer_name == "ImagenetDataLayer":
        # keep the config's own image_size (AlexNet's conv stack needs
        # full-size inputs); PIL upscales the tiny fixture jpegs
        dl = {"data_dir": zoo["imagenet_dir"]}
    elif layer_name == "CifarDataLayer":
        dl = {"data_dir": zoo["cifar_dir"]}
    return dl


@pytest.mark.parametrize("path", ZOO,
                         ids=[os.path.basename(p) for p in ZOO])
def test_config_constructs_and_traces(path, zoo_data):
    module = runpy.run_path(path)
    base_model = module["base_model"]
    params = dict(module["base_params"])
    if isinstance(module.get("train_params"), dict):
        nested_update(params, module["train_params"])

    layer_name = params["data_layer"].__name__
    dl_over = _data_overrides(layer_name, zoo_data, params)
    nested_update(params, {"data_layer_params": dl_over})
    # tiny batches; keep every model/optimizer param exactly as shipped
    params["batch_size_per_gpu"] = 2
    params["iter_size"] = 1
    params.pop("num_gpus", None)
    params.setdefault("num_epochs", 1)
    params.pop("max_steps", None)
    params["logdir"] = ""
    params.pop("load_model", None)

    # ctor runs check_params for the model + every component
    model = base_model(params=params, mode="train")
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))

    # abstract trace: init (param/opt-state shapes) + one train step —
    # catches shape bugs in the full-size architecture without compiling
    state_shape = jax.eval_shape(model.init_state, batch)
    rng = jax.random.PRNGKey(0)
    new_state, metrics = jax.eval_shape(
        lambda s, b: model.train_step(s, b, rng), state_shape, batch)
    assert "loss" in metrics
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(state_shape.params))
    assert n_params > 1000
