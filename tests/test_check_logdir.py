"""Logdir resume/restore semantics (reference `utils/utils.py:633-709`),
including the ``restore_best_checkpoint`` config key (reference
run.py:34-40): eval/infer prefer the newest best_models checkpoint when
the key is set, fall back to the latest periodic one otherwise."""
import os
from types import SimpleNamespace

import pytest

from openseq2seq_tpu.utils.config import check_logdir


def _args(mode="eval", **kw):
    return SimpleNamespace(mode=mode, benchmark=False, no_dir_check=False,
                           continue_learning=False, **kw)


def _mk(logdir, subdir, steps):
    for s in steps:
        os.makedirs(os.path.join(logdir, subdir, str(s)), exist_ok=True)


def test_eval_restores_latest_by_default(tmp_path):
    logdir = str(tmp_path)
    _mk(logdir, "checkpoints", [100, 300, 200])
    _mk(logdir, "best_models", [200])
    got = check_logdir(_args(), {"logdir": logdir})
    assert got == os.path.join(logdir, "checkpoints", "300")


def test_eval_restores_best_when_configured(tmp_path):
    logdir = str(tmp_path)
    _mk(logdir, "checkpoints", [100, 300])
    _mk(logdir, "best_models", [200, 100])
    got = check_logdir(_args(), {"logdir": logdir,
                                 "restore_best_checkpoint": True})
    assert got == os.path.join(logdir, "best_models", "200")


def test_best_falls_back_to_latest_when_no_best_yet(tmp_path):
    logdir = str(tmp_path)
    _mk(logdir, "checkpoints", [100])
    got = check_logdir(_args(), {"logdir": logdir,
                                 "restore_best_checkpoint": True})
    assert got == os.path.join(logdir, "checkpoints", "100")


def test_train_refuses_dirty_logdir_without_flag(tmp_path):
    logdir = str(tmp_path)
    _mk(logdir, "checkpoints", [100])
    with pytest.raises(OSError, match="continue_learning"):
        check_logdir(_args(mode="train"), {"logdir": logdir})


def test_continue_learning_requires_checkpoint(tmp_path):
    logdir = str(tmp_path / "fresh")
    args = _args(mode="train")
    args.continue_learning = True
    with pytest.raises(OSError, match="must contain a checkpoint"):
        check_logdir(args, {"logdir": logdir})


def test_eval_requires_checkpoint(tmp_path):
    with pytest.raises(OSError, match="no checkpoint"):
        check_logdir(_args(), {"logdir": str(tmp_path / "fresh")})
