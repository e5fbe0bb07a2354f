"""Every example config must parse (runpy) and declare base_model +
base_params with schema-valid component wiring where data isn't needed
(reference's de facto API surface is its config zoo)."""
import glob
import os
import runpy

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "example_configs", "*",
                                        "*.py")))
# toy configs build datasets at import; run them last for isolation
PARSE_ONLY = [c for c in CONFIGS if "toy" not in os.path.basename(c)]


@pytest.mark.parametrize("path", PARSE_ONLY,
                         ids=[os.path.basename(p) for p in PARSE_ONLY])
def test_config_parses(path):
    module = runpy.run_path(path)
    assert "base_model" in module
    assert isinstance(module["base_params"], dict)
    bp = module["base_params"]
    assert "data_layer" in bp
    assert "encoder" in bp or bp.get("encoder_params") is None
    # every flagship config declares the optimizer stack
    assert "optimizer" in bp


def test_toy_configs_parse():
    for path in CONFIGS:
        if "toy" in os.path.basename(path):
            module = runpy.run_path(path)
            assert "base_model" in module
