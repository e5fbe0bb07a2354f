#!/usr/bin/env python
"""Generate the WMT-shaped synthetic parallel corpus (see
openseq2seq_tpu/test_utils/fake_wmt.py) so the UNMODIFIED transformer
recipes run turnkey:

    python scripts/make_synth_wmt.py --out /tmp/synthwmt
    WMT16_DIR=/tmp/synthwmt OS2S_LOGDIR=/tmp/tbig_log python run.py \
        --config_file=example_configs/text2text/transformer-big.py \
        --mode=train_eval --max_steps 6000 --eval_steps 1500

Counterpart of scripts/make_synth_corpus.py (the Jasper flagship
turnkey corpus)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synthwmt")
    ap.add_argument("--n_train", type=int, default=60000)
    ap.add_argument("--n_dev", type=int, default=1024)
    ap.add_argument("--n_test", type=int, default=1024)
    ap.add_argument("--n_types", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_t2t", action="store_true",
                    help="skip the wordpiece/tfrecord leg")
    args = ap.parse_args()
    from openseq2seq_tpu.test_utils import fake_wmt
    out = fake_wmt.generate(args.out, n_train=args.n_train,
                            n_dev=args.n_dev, n_test=args.n_test,
                            n_types=args.n_types, seed=args.seed,
                            with_t2t=not args.no_t2t)
    print("corpus at", out)


if __name__ == "__main__":
    main()
