#!/usr/bin/env python
"""CLI entry point (reference `run.py:19-104`):

    python run.py --config_file=example_configs/... --mode=train_eval

Modes: train, eval, train_eval, infer, interactive_infer. Every scalar
leaf of the config's ``base_params`` is overridable as ``--a/b/c value``.
``--benchmark`` rewrites the config for throughput measurement.
"""
from __future__ import annotations

import os
import sys

import jax

from openseq2seq_tpu.parallel.mesh import mesh_from_config
from openseq2seq_tpu.training import trainer
from openseq2seq_tpu.utils.config import (apply_benchmark_mode, check_logdir,
                                          configs_for_modes, get_base_config,
                                          setup_compile_cache)
from openseq2seq_tpu.utils.logging import deco_print, enable_logs


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    args, base_config, base_model, config_module = get_base_config(argv)

    # multi-host SPMD: when launched under a multi-process coordinator
    # (GKE/TPU pod env vars set), initialize the global runtime so every
    # process sees the full device mesh (replaces the reference's
    # hvd.init() + MPI barrier, `run.py:42-49`). Must run before any
    # rank-gated host-side setup below.
    if os.environ.get("COORDINATOR_ADDRESS") or \
            os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    num_workers = jax.process_count()
    worker_id = jax.process_index()

    if args.enable_logs and base_config.get("logdir") and worker_id == 0:
        enable_logs(base_config["logdir"])

    # persistent XLA compilation cache (config `compile_cache_dir` or
    # env OS2S_COMPILE_CACHE) — must run before the first jit
    setup_compile_cache(base_config)

    if args.benchmark:
        base_config = apply_benchmark_mode(base_config, args.bench_steps,
                                           args.bench_start)
        config_module = dict(config_module)
        config_module["base_params"] = base_config

    restore_checkpoint = check_logdir(args, base_config)

    mode_configs = configs_for_modes(args, base_config, config_module)
    mesh = mesh_from_config(base_config)
    deco_print("Mesh: {}".format(dict(zip(mesh.axis_names, mesh.devices.shape))))

    models = {}
    for mode, cfg in mode_configs.items():
        models[mode] = base_model(params=cfg, mode=mode, mesh=mesh,
                                  num_workers=num_workers,
                                  worker_id=worker_id)

    if args.mode in ("train", "train_eval"):
        trainer.train(models["train"], models.get("eval"),
                      checkpoint=restore_checkpoint)
    elif args.mode == "eval":
        trainer.evaluate(models["eval"], restore_checkpoint)
    elif args.mode == "infer":
        trainer.infer(models["infer"], restore_checkpoint,
                      args.infer_output_file)
    elif args.mode == "interactive_infer":
        _interactive_repl(models["interactive_infer"], restore_checkpoint)


def _interactive_repl(model, checkpoint):
    """Tiny stdin REPL for interactive inference: each line is a wav
    path (ASR) or a sentence (TTS — the wav is synthesized via
    Griffin-Lim and its path printed; `scripts/synthesize.py` is the
    batch version). The reference drives this mode from notebooks /
    frame_asr.py; streaming apps should use
    openseq2seq_tpu/apps/frame_asr.py."""
    state = trainer.restore_state(model, checkpoint)
    import jax as _jax
    eval_fn = _jax.jit(model.eval_step)
    dl = model.get_data_layer()
    is_tts = hasattr(model, "synthesize_wav")
    prompt = "text> " if is_tts else "wav> "
    deco_print("Interactive inference. Enter a {} per line "
               "(Ctrl-D to quit).".format("sentence" if is_tts
                                          else "wav path"))
    n_synth = 0
    while True:
        try:
            line = input(prompt).strip()
        except EOFError:
            break
        if not line:
            continue
        try:
            batch = dl.create_interactive_batch(line)
            out = _jax.device_get(eval_fn(state, batch))
            if is_tts:
                import numpy as _np
                from scipy.io import wavfile as _wavfile
                spec, lengths = out["outputs"]["decoder_output"]["outputs"]
                n = int(_np.asarray(lengths)[0])
                wav = model.synthesize_wav(_np.asarray(spec)[0, :n])
                sr = dl.params.get("sample_freq", 22050)
                path = "interactive_synth_{}.wav".format(n_synth)
                n_synth += 1
                peak = float(_np.max(_np.abs(wav))) or 1.0
                _wavfile.write(path, sr, (wav / peak * 0.9 *
                                          32767).astype(_np.int16))
                print(path)
            else:
                for _, text in model.infer(batch, out):
                    print(text)
        except Exception as e:  # keep the REPL alive on bad input
            print("error: {}".format(e))


if __name__ == "__main__":
    main()
