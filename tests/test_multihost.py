"""Multi-host (2 processes x 4 virtual CPU devices) correctness test
(VERDICT r1 next-steps #2):

* global WER from the 2-process run equals the single-process value
  computed from the same checkpoint (collect_results gathers every
  worker's eval shard);
* only process 0 writes the logdir (rank gating for checkpoints).

Spawns real jax.distributed processes with gloo CPU collectives, so it
exercises process_allgather / host_local_array_to_global_array /
sync_global_devices for real — the reference had no such test at all
(SURVEY §4.2: "no multi-node test harness").
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_eval_matches_single_process(toy_speech_data,
                                                       tmp_path):
    logdir = str(tmp_path / "mh")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port),
             toy_speech_data["csv"], toy_speech_data["vocab"], logdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, "worker {} failed:\n{}".format(pid, out)

    results = {}
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, outputs

    # every process reports the same GLOBAL metrics
    np.testing.assert_allclose(results[0]["wer"], results[1]["wer"])
    np.testing.assert_allclose(results[0]["eval_loss"],
                               results[1]["eval_loss"], rtol=1e-5)

    # rank gating: the checkpoint exists exactly once, written by proc 0
    ckpt = os.path.join(logdir, "checkpoints", "4")
    assert os.path.isdir(ckpt)

    # single-process evaluation of the SAME checkpoint must yield the
    # same global WER (the multihost gather changes nothing)
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils.test_speech_configs import \
        w2l_test_config
    from openseq2seq_tpu.training import trainer
    params, _ = w2l_test_config(toy_speech_data["csv"],
                                toy_speech_data["vocab"], logdir=logdir)
    params["batch_size_per_gpu"] = 1
    del params["num_epochs"]
    params["max_steps"] = 4
    del params["eval_steps"]
    model = Speech2Text(params=params, mode="eval")
    metrics = trainer.evaluate(model, ckpt)
    # WER is exact regardless of batch partitioning (padded rows are
    # clipped via batch_valid); eval_loss is batch-mean-weighted so it
    # is only comparable within identical partitionings (checked above)
    np.testing.assert_allclose(metrics["Eval WER"], results[0]["wer"])


@pytest.mark.slow
def test_two_process_tensor_parallel_nmt_matches_dp(tmp_path):
    """Multi-host + megatron TP composed: 2 processes x 4 devices on a
    (data=4, model=2) mesh train the toy transformer. Control: the
    same 2-process run on a pure-DP (data=8) mesh with the same global
    batch — identical data feeding, so the TP kernel sharding must not
    change the loss trajectory. Both processes must also agree on the
    global loss within each run."""
    from openseq2seq_tpu.test_utils import toy_nmt

    data = toy_nmt.generate(str(tmp_path / "nmt"))
    losses = {}
    for mode in ("nmt_tp", "nmt_dp"):
        logdir = str(tmp_path / ("mh_" + mode))
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        procs = []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, WORKER, str(pid), "2", str(port),
                 data["dir"], data["vocab"], logdir, mode],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outputs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outputs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outputs)):
            assert p.returncode == 0, \
                "worker {} ({}) failed:\n{}".format(pid, mode, out)
        results = {}
        for out in outputs:
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
                    results[r["pid"]] = r
        assert set(results) == {0, 1}, outputs
        np.testing.assert_allclose(results[0]["loss"],
                                   results[1]["loss"], rtol=1e-6)
        losses[mode] = results[0]["loss"]

    np.testing.assert_allclose(losses["nmt_tp"], losses["nmt_dp"],
                               rtol=1e-4)


@pytest.mark.slow
def test_two_process_tp_pp_matches_single_process(tmp_path):
    """TP x PP with the PIPELINE axis spanning the process boundary
    (VERDICT r3 #10): a (data=1, pipe=4, model=2) mesh laid out
    pipe-major over 2 processes x 4 devices puts stages 0-1 on
    process 0 and stages 2-3 on process 1, so every stage-1 -> stage-2
    microbatch handoff crosses processes. The loss after 4 steps must
    match a single-process run of the identical mesh/config."""
    from openseq2seq_tpu.test_utils import toy_nmt

    data = toy_nmt.generate(str(tmp_path / "nmt"))
    losses = {}
    for nproc in (2, 1):
        logdir = str(tmp_path / "mh_tpp_{}".format(nproc))
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        procs = []
        for pid in range(nproc):
            procs.append(subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(nproc), str(port),
                 data["dir"], data["vocab"], logdir, "nmt_tp_pp"],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outputs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outputs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outputs)):
            assert p.returncode == 0, \
                "worker {} (nproc={}) failed:\n{}".format(pid, nproc, out)
        results = {}
        for out in outputs:
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
                    results[r["pid"]] = r
        assert set(results) == set(range(nproc)), outputs
        if nproc == 2:
            np.testing.assert_allclose(results[0]["loss"],
                                       results[1]["loss"], rtol=1e-6)
        losses[nproc] = results[0]["loss"]

    np.testing.assert_allclose(losses[2], losses[1], rtol=1e-4)
