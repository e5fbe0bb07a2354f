"""Neural n-best rescoring: a toy LM trained on the true distribution
must fix an acoustically-ambiguous 1-best."""
import numpy as np
import pytest

from openseq2seq_tpu.apps.lm_rescorer import NeuralRescorer
from openseq2seq_tpu.models import LSTMLM
from openseq2seq_tpu.training import trainer
from tests.test_lm import _lm_config


@pytest.fixture(scope="module")
def skewed_corpus(tmp_path_factory):
    """Corpus where 'aa bb' is very common and 'aa cc' never occurs."""
    out = tmp_path_factory.mktemp("rescore_lm")
    with open(out / "train.txt", "w") as f:
        for _ in range(200):
            f.write("aa bb cc dd\n")
    for split in ("valid", "test"):
        with open(out / "{}.txt".format(split), "w") as f:
            for _ in range(20):
                f.write("aa bb cc dd\n")
    return str(out)


def test_neural_rescoring_prefers_lm_likely_hypothesis(skewed_corpus,
                                                       tmp_path):
    cfg = _lm_config(skewed_corpus, str(tmp_path), num_epochs=40,
                     bptt=8)
    cfg["logdir"] = str(tmp_path / "lm_logs")
    cfg["save_checkpoint_steps"] = 10**9  # final save only
    model = LSTMLM(params=cfg, mode="train")
    result = trainer.train(model)
    import os
    ckpts = os.listdir(os.path.join(cfg["logdir"], "checkpoints"))
    ckpt = os.path.join(cfg["logdir"], "checkpoints", max(ckpts, key=int))

    eval_cfg = _lm_config(skewed_corpus, str(tmp_path))
    lm_model = LSTMLM(params=eval_cfg, mode="eval")
    rescorer = NeuralRescorer(lm_model, ckpt)

    # LM must prefer the in-distribution continuation
    scores = rescorer.lm_scores(["aa bb cc dd", "aa dd bb cc"])
    assert scores[0] > scores[1]

    # acoustics slightly prefer the wrong one; LM flips it
    nbest = [[(-1.0, "aa dd bb cc"), (-1.2, "aa bb cc dd")]]
    best = rescorer.rescore(nbest, lm_weight=0.5)
    assert best[0] == "aa bb cc dd"
