"""The native decoder must build from a clean tree with one `make`
(docs/installation.md) — the reference needed a TF source tree + Bazel
+ SWIG for its two C++ decoders; ours is plain g++. Rebuild in a temp
copy and load the result through the real ctypes binding."""
import ctypes
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "ctc_decoder")


@pytest.mark.skipif(shutil.which("make") is None or
                    shutil.which("g++") is None,
                    reason="no native toolchain")
def test_make_builds_loadable_library(tmp_path):
    build = tmp_path / "ctc_decoder"
    shutil.copytree(SRC, build)
    (build / "libos2s_ctc.so").unlink(missing_ok=True)
    subprocess.run(["make", "-C", str(build)], check=True,
                   capture_output=True, text=True)
    lib = ctypes.CDLL(str(build / "libos2s_ctc.so"))
    # the C API surface the ctypes binding relies on
    for sym in ("os2s_scorer_create", "os2s_scorer_destroy",
                "os2s_decode", "os2s_decode_batch",
                "os2s_stream_create", "os2s_stream_decode"):
        assert hasattr(lib, sym), sym
