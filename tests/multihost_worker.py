"""Worker process for the multi-host correctness test.

Launched (2x) by tests/test_multihost.py with a shared gloo coordinator:
each process sees 4 virtual CPU devices (8 global), trains the toy W2L
model data-parallel over the GLOBAL mesh with per-host batch feeding,
saves checkpoints (process 0 only), then evaluates from the checkpoint —
exercising collect_results so the reported WER is global.

Usage: python multihost_worker.py <pid> <nproc> <port> <csv> <vocab> <logdir>
       [mode]

``mode`` (default "asr_dp"): "asr_dp" = the W2L data-parallel flow
above; "nmt_tp" = toy transformer NMT on a (data=2*nproc, model=2)
mesh — multi-host training with megatron tensor-parallel param
shards (csv arg = the toy-NMT data dir, vocab unused);
"nmt_tp_pp" = toy transformer on a (data=1, pipe=4, model=2) mesh
laid out pipe-major so pipeline stages 0-1 live on process 0 and
stages 2-3 on process 1 — every microbatch handoff between stages 1
and 2 is a real cross-process transfer, with megatron TP inside each
stage. Also runs single-process (nproc=1, 8 local devices) as the
equality comparator.
"""
import json
import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]
CSV, VOCAB, LOGDIR = sys.argv[4], sys.argv[5], sys.argv[6]
MODE = sys.argv[7] if len(sys.argv) > 7 else "asr_dp"

LOCAL_DEVICES = 8 // NPROC  # 8 global devices regardless of layout

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count={}".format(LOCAL_DEVICES))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address="localhost:{}".format(PORT),
                           num_processes=NPROC, process_id=PID)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == LOCAL_DEVICES

from openseq2seq_tpu.models import Speech2Text  # noqa: E402
from openseq2seq_tpu.parallel.mesh import make_mesh  # noqa: E402
from openseq2seq_tpu.test_utils.test_speech_configs import (  # noqa: E402
    w2l_test_config)
from openseq2seq_tpu.training import trainer  # noqa: E402


def _params(mode):
    params, _ = w2l_test_config(CSV, VOCAB, logdir=LOGDIR)
    params["batch_size_per_gpu"] = 1
    del params["num_epochs"]
    params["max_steps"] = 4
    params["save_checkpoint_steps"] = 4
    params["print_loss_steps"] = 2
    del params["eval_steps"]
    return params


if MODE == "nmt_tp_pp":
    # TP x PP with the PIPELINE axis crossing the process boundary:
    # mesh (data=1, pipe=4, model=2), grid laid out pipe-major so
    # stages 0-1 are process 0's devices and stages 2-3 process 1's.
    # data=1 means both hosts feed the identical (replicated) global
    # batch — mhu.host_local_array_to_global_array's replication
    # contract — so the loss must match a single-process run of the
    # same mesh bit-for-bit up to reduction order.
    import numpy as np

    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.test_utils import toy_nmt
    from openseq2seq_tpu.training import trainer as trainer_mod

    data = {"train_src": os.path.join(CSV, "train.src"),
            "train_tgt": os.path.join(CSV, "train.tgt"),
            "eval_src": os.path.join(CSV, "eval.src"),
            "eval_tgt": os.path.join(CSV, "eval.tgt"),
            "vocab": os.path.join(CSV, "vocab.txt"), "dir": CSV}
    cfg = toy_nmt.transformer_toy_config(data, num_epochs=1)
    cfg["logdir"] = LOGDIR
    cfg["max_steps"] = 4
    del cfg["num_epochs"]
    cfg["print_loss_steps"] = 2
    cfg["data_layer_params"]["shuffle"] = False
    cfg["encoder_params"]["encoder_layers"] = 4
    cfg["decoder_params"]["num_hidden_layers"] = 4
    cfg["num_pipeline_stages"] = 4
    cfg["num_model_partitions"] = 2
    cfg["num_pipeline_microbatches"] = 2
    cfg["batch_size_per_gpu"] = 8
    grid = np.array(jax.devices()).reshape(1, 4, 2)
    mesh = jax.sharding.Mesh(grid, ("data", "pipe", "model"))
    # stage placement sanity: with 2 processes the pipe axis spans them
    if NPROC == 2:
        stage_procs = [{d.process_index for d in grid[0, s]}
                       for s in range(4)]
        assert stage_procs[0] == {0} and stage_procs[3] == {1}, stage_procs
    # both hosts feed the full identical stream (no worker sharding)
    model = Text2Text(params=cfg, mode="train", mesh=mesh,
                      num_workers=1, worker_id=0)
    result = trainer_mod.train(model)
    print("RESULT " + json.dumps(
        {"pid": PID,
         "loss": float(result["last_metrics"]["loss"])}), flush=True)
    jax.distributed.shutdown()
    os._exit(0)

if MODE in ("nmt_tp", "nmt_dp"):
    # toy transformer spanning both hosts: gradient psums cross
    # processes over `data`; in "nmt_tp" megatron TP also shards
    # kernels over `model` (tp_state_sharding). Global batches are
    # assembled from per-host shards in shard_batch. The test compares
    # the two modes' losses — identical data feeding, so TP sharding
    # must change nothing
    from openseq2seq_tpu.models import Text2Text
    from openseq2seq_tpu.test_utils import toy_nmt

    data = {"train_src": os.path.join(CSV, "train.src"),
            "train_tgt": os.path.join(CSV, "train.tgt"),
            "eval_src": os.path.join(CSV, "eval.src"),
            "eval_tgt": os.path.join(CSV, "eval.tgt"),
            "vocab": os.path.join(CSV, "vocab.txt"), "dir": CSV}
    cfg = toy_nmt.transformer_toy_config(data, num_epochs=1)
    cfg["logdir"] = LOGDIR
    cfg["max_steps"] = 4
    del cfg["num_epochs"]
    cfg["print_loss_steps"] = 2
    cfg["data_layer_params"]["shuffle"] = False
    # keep the GLOBAL batch (8) identical across both meshes so the
    # loss trajectories are directly comparable
    if MODE == "nmt_tp":
        cfg["batch_size_per_gpu"] = 2
        mesh = make_mesh(num_data=2 * NPROC, num_model=2)
    else:
        cfg["batch_size_per_gpu"] = 1
        mesh = make_mesh(num_data=4 * NPROC, num_model=1)
    model = Text2Text(params=cfg, mode="train", mesh=mesh,
                      num_workers=NPROC, worker_id=PID)
    result = trainer.train(model)
    print("RESULT " + json.dumps(
        {"pid": PID,
         "loss": float(result["last_metrics"]["loss"])}), flush=True)
    # explicit teardown: exiting with live gloo channels intermittently
    # aborts in C++ thread teardown ("FATAL: exception not rethrown")
    jax.distributed.shutdown()
    os._exit(0)

mesh = make_mesh(num_data=4 * NPROC, num_model=1)

train_model = Speech2Text(params=_params("train"), mode="train", mesh=mesh,
                          num_workers=NPROC, worker_id=PID)
trainer.train(train_model)

ckpt = os.path.join(LOGDIR, "checkpoints", "4")
eval_model = Speech2Text(params=_params("eval"), mode="eval", mesh=mesh,
                         num_workers=NPROC, worker_id=PID)
metrics = trainer.evaluate(eval_model, ckpt)

print("RESULT " + json.dumps({"pid": PID, "wer": metrics["Eval WER"],
                              "eval_loss": metrics["eval_loss"]}),
      flush=True)
jax.distributed.shutdown()
os._exit(0)
