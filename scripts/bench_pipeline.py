#!/usr/bin/env python
"""Host input-pipeline throughput: featurized utterances/sec for the
thread pool vs the forked process pool, with SpecAugment + dither on
(the flagship recipe's settings). The reference's tf.py_func featurizer
was its acknowledged input bottleneck (`docs/sources/source/
speech-commands.rst:28`); here per-example RNGs keep augmentation from
serializing the pipeline, and ``use_process_pool`` escapes the GIL
(numpy featurization is GIL-bound, so threads top out at ~1 core).

NOTE: meaningful only on multi-core hosts — on a 1-vCPU box every
configuration measures the same single core minus pool overhead.

Usage: python scripts/bench_pipeline.py [n_utts]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import tempfile
    from scipy.io import wavfile
    from openseq2seq_tpu.data.speech2text import Speech2TextDataLayer

    # synth: ~5 s utterances at 16 kHz
    d = tempfile.mkdtemp(prefix="os2s_pipe_bench")
    rng = np.random.RandomState(0)
    csv = os.path.join(d, "data.csv")
    vocab = os.path.join(d, "vocab.txt")
    with open(vocab, "w") as f:
        f.write("a\nb\nc\n")
    with open(csv, "w") as f:
        f.write("wav_filename,wav_filesize,transcript\n")
        for i in range(n_utts):
            path = os.path.join(d, "u{}.wav".format(i))
            sig = (rng.randn(16000 * 5) * 3000).astype(np.int16)
            wavfile.write(path, 16000, sig)
            f.write("{},{},abc abc\n".format(path, os.path.getsize(path)))

    results = {}
    for workers, pool in ((1, False), (8, False), (4, True), (8, True),
                          (16, True)):
        dl = Speech2TextDataLayer({
            "mode": "train", "batch_size": 16, "shuffle": False,
            "num_audio_features": 64, "input_type": "logfbank",
            "vocab_file": vocab, "dataset_files": [csv],
            "sample_freq": 16000, "dither": 1e-5,
            "map_parallel_calls": workers,
            "use_process_pool": pool,
            "augmentation": {"n_freq_mask": 2, "n_time_mask": 2,
                             "width_freq_mask": 6, "width_time_mask": 6},
        }, model=None)
        dl.seed(0)
        t0 = time.time()
        n = sum(b["source_tensors"][0].shape[0]
                for b in dl.iterate_one_epoch())
        key = "{}proc_{}".format("" if pool else "thread_", workers)
        results[key] = round(n / (time.time() - t0), 1)
    print(json.dumps({"metric": "featurizer_utt_per_sec", **results}))


if __name__ == "__main__":
    main()
