"""Test config: force CPU with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (SURVEY §4's TPU-specific addition).

Note: this environment preloads a TPU PJRT plugin via sitecustomize
before conftest runs, so plain JAX_PLATFORMS env vars are too late —
we override the live jax config instead.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: long-running convergence tests")


@pytest.fixture(scope="session")
def toy_speech_data(tmp_path_factory):
    from openseq2seq_tpu.test_utils import toy_speech
    out = tmp_path_factory.mktemp("toy_speech")
    csv_path, vocab_path = toy_speech.generate(str(out))
    return {"csv": csv_path, "vocab": vocab_path, "dir": str(out)}
