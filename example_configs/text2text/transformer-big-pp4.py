"""Transformer-big EN->DE with 4-stage pipeline parallelism over the
encoder stack (beyond reference parity — OpenSeq2Seq has data
parallelism only, SURVEY §2.2).

`num_pipeline_stages: 4` makes `mesh_from_config` build a
("data", "pipe") mesh; the 12 encoder layers become one stacked
parameter tree (leading layer axis, 3 layers per stage) sharded over
`pipe` — each stage's devices hold only their layers' params and
optimizer moments — and run as a GPipe microbatch schedule
(`docs/distributed.md`). Without a pipe mesh (e.g. single chip) the
same checkpoint runs the stack as a plain layer scan.

Note the deeper 12-layer encoder: pipeline parallelism is the lever
for stacks too deep for one chip's HBM; bubble fraction is
(S-1)/(M+S-1) = 3/11 at the default 8 microbatches.
"""
import os
import runpy

_here = os.path.dirname(os.path.abspath(__file__))
_big = runpy.run_path(os.path.join(_here, "transformer-big-novograd.py"))

base_model = _big["base_model"]
base_params = _big["base_params"]
eval_params = _big.get("eval_params", {})
infer_params = _big.get("infer_params", {})

base_params["logdir"] = os.environ.get("OS2S_LOGDIR",
                                       "transformer-big-pp4-log")
base_params["num_pipeline_stages"] = 4
base_params["num_pipeline_microbatches"] = 8
base_params["encoder_params"]["encoder_layers"] = 12
# the decoder stack pipelines too (stacked layers, 2 per stage);
# like the encoder it is deepened so the depth divides the stages
base_params["decoder_params"]["num_hidden_layers"] = 8
# homogeneous-stack constraints (see TransformerEncoder.make_module)
base_params["encoder_params"].pop("sequence_parallel", None)
base_params["encoder_params"].pop("use_flash_attention", None)
base_params["decoder_params"].pop("sequence_parallel", None)
base_params["decoder_params"].pop("use_flash_attention", None)
