"""Worker process for the multi-host correctness test.

Launched (2x) by tests/test_multihost.py with a shared gloo coordinator:
each process sees 4 virtual CPU devices (8 global), trains the toy W2L
model data-parallel over the GLOBAL mesh with per-host batch feeding,
saves checkpoints (process 0 only), then evaluates from the checkpoint —
exercising collect_results so the reported WER is global.

Usage: python multihost_worker.py <pid> <nproc> <port> <csv> <vocab> <logdir>
"""
import json
import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]
CSV, VOCAB, LOGDIR = sys.argv[4], sys.argv[5], sys.argv[6]

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address="localhost:{}".format(PORT),
                           num_processes=NPROC, process_id=PID)
assert len(jax.devices()) == 4 * NPROC, jax.devices()
assert len(jax.local_devices()) == 4

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
