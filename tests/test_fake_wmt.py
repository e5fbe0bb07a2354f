"""Synthetic WMT corpus (`test_utils/fake_wmt.py`): deterministic
generation, the context-dependent translation rule, recipe-contract
file layout, and a perfect-translation BLEU of 100 through the same
scorer the turnkey run uses."""
import os
import subprocess
import sys

import numpy as np

from openseq2seq_tpu.test_utils import fake_wmt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_translate_rule_contextual():
    # suffix depends on the PRECEDING source word's parity; first word
    # on sentence-length parity; pairs swapped
    words = [3, 4, 7]
    out = fake_wmt._translate(words, n_types=16)
    # pre-swap: [x003z (len 3 odd -> z), x004z (prev 3 odd), x007q
    # (prev 4 even)]; swap first pair:
    assert out == ["x004z", "x003z", "x007q"]


def test_generate_idempotent_and_layout(tmp_path):
    d1 = fake_wmt.generate(str(tmp_path / "wmt"), n_train=50, n_dev=8,
                           n_test=8, n_types=32, with_t2t=False)
    stamp = os.path.getmtime(os.path.join(d1, "m_common.vocab"))
    d2 = fake_wmt.generate(str(tmp_path / "wmt"), n_train=50, n_dev=8,
                           n_test=8, n_types=32, with_t2t=False)
    assert d1 == d2
    assert os.path.getmtime(os.path.join(d2, "m_common.vocab")) == stamp
    for name in ("train.clean.en.shuffled.BPE_common.32K.tok",
                 "train.clean.de.shuffled.BPE_common.32K.tok",
                 "wmt13-en-de.src.BPE_common.32K.tok",
                 "wmt13-en-de.ref.BPE_common.32K.tok",
                 "wmt14-en-de.src.BPE_common.32K.tok",
                 "wmt14-en-de.ref.BPE_common.32K.tok",
                 "m_common.vocab"):
        assert os.path.exists(os.path.join(d2, name)), name


def test_no_unks_under_recipe_vocab(tmp_path):
    """Every corpus token is in m_common.vocab (the recipe's shared
    vocab contract)."""
    d = fake_wmt.generate(str(tmp_path / "wmt"), n_train=80, n_dev=8,
                          n_test=8, n_types=32, with_t2t=False)
    vocab = set()
    with open(os.path.join(d, "m_common.vocab")) as f:
        for line in f:
            vocab.add(line.strip())
    for name in ("train.clean.en.shuffled.BPE_common.32K.tok",
                 "train.clean.de.shuffled.BPE_common.32K.tok"):
        with open(os.path.join(d, name)) as f:
            for line in f:
                for tok in line.split():
                    assert tok in vocab, tok


def test_oracle_translation_scores_100(tmp_path):
    """Re-deriving the targets from the sources and scoring against the
    shipped references gives BLEU 100 — the turnkey ceiling is real."""
    d = fake_wmt.generate(str(tmp_path / "wmt"), n_train=50, n_dev=32,
                          n_test=8, n_types=32, with_t2t=False)
    hyp = os.path.join(str(tmp_path), "hyp.txt")
    with open(os.path.join(d, "wmt13-en-de.src.BPE_common.32K.tok")) as f, \
            open(hyp, "w") as out:
        for line in f:
            words = [int(t[1:]) for t in line.split()]
            out.write(" ".join(fake_wmt._translate(words, 32)) + "\n")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "score_bleu.py"),
         hyp, os.path.join(d, "wmt13-en-de.ref.BPE_common.32K.tok")],
        capture_output=True, text=True, check=True)
    assert "BLEU = 100.00" in r.stdout, r.stdout
