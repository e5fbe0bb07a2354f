#!/usr/bin/env python
"""Average the parameters of the last N checkpoints into a new one —
the standard transformer eval trick (the reference's docs point users
at Tensor2Tensor's avg_checkpoints for its NMT results).

Usage:
  python scripts/avg_checkpoints.py --logdir result/transformer/logs \
      --num_checkpoints 5 [--output_step 999999]

The averaged checkpoint is written back into the same checkpoints/
directory under --output_step, so ``run.py --mode=eval
--logdir ...`` picks it up as the latest.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def average_checkpoints(logdir: str, num_checkpoints: int = 5,
                        output_step: int = 999_999) -> str:
    import jax
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.join(os.path.abspath(logdir), "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_dir)
                   if d.isdigit())
    use = steps[-num_checkpoints:]
    if not use:
        raise SystemExit("no checkpoints under {}".format(ckpt_dir))
    ckptr = ocp.StandardCheckpointer()

    avg = None
    template = None
    for step in use:
        tree = ckptr.restore(os.path.join(ckpt_dir, str(step)))
        if template is None:
            template = tree
        params = tree["params"]
        if avg is None:
            avg = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), params)
        else:
            avg = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64), avg, params)
    n = float(len(use))
    avg = jax.tree_util.tree_map(
        lambda a, x: (a / n).astype(np.asarray(x).dtype),
        avg, template["params"])

    out = dict(template)
    out["params"] = avg
    path = os.path.join(ckpt_dir, str(output_step))
    ckptr.save(path, out)
    ckptr.wait_until_finished()
    print("Averaged checkpoints {} -> {}".format(use, path))
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--num_checkpoints", type=int, default=5)
    p.add_argument("--output_step", type=int, default=999_999)
    args = p.parse_args(argv)
    average_checkpoints(args.logdir, args.num_checkpoints,
                        args.output_step)
    return 0


if __name__ == "__main__":
    sys.exit(main())
