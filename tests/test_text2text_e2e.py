"""Transformer NMT end-to-end on the toy reversal task (the analogue of
the reference's `models/text2text_test.py` + run_all_tests.sh toy NMT
runs)."""
import os

import numpy as np
import pytest

from openseq2seq_tpu.models import Text2Text
from openseq2seq_tpu.test_utils import toy_nmt
from openseq2seq_tpu.training import trainer


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    out = tmp_path_factory.mktemp("toy_nmt")
    return toy_nmt.generate(str(out))


def _build(toy, mode="train", files=None, **kw):
    files = files or ("train" if mode == "train" else "eval")
    params = toy_nmt.transformer_toy_config(toy, mode_files=files, **kw)
    if mode != "train":
        params["data_layer_params"]["shuffle"] = False
    return Text2Text(params=params, mode=mode)


def test_data_layer_batches(toy_data):
    model = _build(toy_data, "train", num_epochs=1)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    x, x_len = batch["source_tensors"]
    y, y_len = batch["target_tensors"]
    assert x.shape[0] == 32
    # source ends with EOS (1)
    assert x[0, x_len[0] - 1] == 1
    # target starts with S (2) and ends with EOS
    assert y[0, 0] == 2
    assert y[0, y_len[0] - 1] == 1
    # reversal: src tokens reversed == tgt tokens
    src_toks = x[0, :x_len[0] - 1].tolist()
    tgt_toks = y[0, 1:y_len[0] - 1].tolist()
    assert src_toks == tgt_toks[::-1]


def test_single_train_step(toy_data):
    import jax
    model = _build(toy_data, "train", num_epochs=1)
    dl = model.get_data_layer()
    batch = next(iter(dl.iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # shared embedding: encoder table must receive decoder-side grads —
    # check it changed
    emb0 = jax.tree_util.tree_leaves(
        {"e": state.params["enc"]})[0]
    emb1 = jax.tree_util.tree_leaves(
        {"e": new_state.params["enc"]})[0]
    assert not np.allclose(np.asarray(emb0), np.asarray(emb1))


@pytest.mark.slow
def test_reversal_convergence_and_bleu(toy_data):
    train_model = _build(toy_data, "train", num_epochs=100)
    result = trainer.train(train_model)
    final_loss = float(result["last_metrics"]["loss"])
    assert final_loss < 1.0, "loss did not converge: {}".format(final_loss)

    eval_model = _build(toy_data, "eval", num_epochs=100)
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert metrics["Eval BLEU"] > 80.0, metrics


def test_transformer_batch_norm_variant(tmp_path):
    """norm_params {"type": "batch_norm"} swaps layer norm for the
    Transformer_BatchNorm variant: running stats live in batch_stats
    and get updated by training (reference transformer-bn.py)."""
    import jax
    import numpy as np
    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.test_utils import toy_nmt

    data = toy_nmt.generate(str(tmp_path))
    cfg = toy_nmt.transformer_toy_config(data, num_epochs=1)
    norm = {"type": "batch_norm", "momentum": 0.95, "epsilon": 1e-5,
            "center_scale": False}
    cfg["encoder_params"]["norm_params"] = norm
    cfg["decoder_params"]["norm_params"] = norm
    model = Text2Text(params=cfg, mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    assert "batch_stats" in state.model_state
    stats0 = jax.tree_util.tree_leaves(
        state.model_state["batch_stats"])[0]
    db = jax.tree_util.tree_map(np.asarray, batch)
    new_state, metrics = jax.jit(model.train_step)(
        state, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    stats1 = jax.tree_util.tree_leaves(
        new_state.model_state["batch_stats"])[0]
    assert not np.allclose(np.asarray(stats0), np.asarray(stats1))


def test_score_bleu_script(tmp_path):
    """scripts/score_bleu.py — the multi-bleu.perl equivalent: exact
    BLEU on a perfect match, sane components on a partial match."""
    import subprocess
    import sys

    hyp = tmp_path / "hyp.txt"
    ref = tmp_path / "ref.txt"
    ref.write_text("the cat sat on the mat\na b c d\n")
    hyp.write_text("the cat sat on the mat\na b c d\n")
    out = subprocess.run(
        [sys.executable, "scripts/score_bleu.py", str(hyp), str(ref)],
        capture_output=True, text=True, check=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir))
    assert out.stdout.startswith("BLEU = 100.00"), out.stdout

    hyp.write_text("the cat sat on the hat\nA b c d\n")
    out = subprocess.run(
        [sys.executable, "scripts/score_bleu.py", "-lc", str(hyp),
         str(ref)],
        capture_output=True, text=True, check=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir))
    score = float(out.stdout.split()[2].rstrip(","))
    assert 0.0 < score < 100.0, out.stdout
