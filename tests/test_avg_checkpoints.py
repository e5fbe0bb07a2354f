"""Checkpoint averaging (`scripts/avg_checkpoints.py`) — the standard
transformer eval trick the reference's docs delegate to T2T's
avg_checkpoints. Verifies the averaged artifact is (a) numerically the
mean of the source checkpoints' params, and (b) loadable through the
normal restore/eval flow as the latest checkpoint."""
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "scripts"))

from avg_checkpoints import average_checkpoints  # noqa: E402
from openseq2seq_tpu.models import Speech2Text  # noqa: E402
from openseq2seq_tpu.test_utils.test_speech_configs import (  # noqa: E402
    w2l_test_config)
from openseq2seq_tpu.training import trainer  # noqa: E402


def _flat(tree):
    import flax
    return {"/".join(k): np.asarray(v) for k, v in
            flax.traverse_util.flatten_dict(tree).items()}


def test_avg_checkpoints_mean_and_eval(toy_speech_data, tmp_path):
    logdir = str(tmp_path / "run")
    params, _ = w2l_test_config(toy_speech_data["csv"],
                                toy_speech_data["vocab"],
                                logdir=logdir, num_epochs=10)
    params["save_checkpoint_steps"] = 5
    model = Speech2Text(params=params, mode="train")
    trainer.train(model)

    ckpt_dir = os.path.join(logdir, "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert len(steps) >= 2, steps

    out = average_checkpoints(logdir, num_checkpoints=2,
                              output_step=999_999)
    assert os.path.isdir(out)

    # (a) the written params are the exact mean of the last two sources
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    src = [_flat(ckptr.restore(os.path.join(ckpt_dir, str(s)))["params"])
           for s in steps[-2:]]
    avg = _flat(ckptr.restore(out)["params"])
    assert set(avg) == set(src[0])
    for key in avg:
        want = ((src[0][key].astype(np.float64) +
                 src[1][key].astype(np.float64)) / 2.0)
        np.testing.assert_allclose(avg[key], want.astype(avg[key].dtype),
                                   rtol=1e-6, atol=1e-6, err_msg=key)

    # (b) the averaged step is now the latest; the eval flow restores it
    from openseq2seq_tpu.utils.config import _latest_checkpoint
    latest = _latest_checkpoint(logdir)
    assert latest and latest.rstrip(os.sep).endswith("999999")

    eval_model = Speech2Text(params=dict(params), mode="eval")
    state = trainer.restore_state(eval_model, checkpoint=latest)
    restored = _flat(state.params)
    for key in avg:
        np.testing.assert_allclose(restored[key], avg[key],
                                   rtol=1e-6, atol=1e-6, err_msg=key)
    metrics = trainer.evaluate_with_state(eval_model, state)
    assert np.isfinite(metrics["eval_loss"])
