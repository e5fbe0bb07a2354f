"""The generated API reference (docs/api/) must be current: regenerate
into a temp dir and compare byte-for-byte (the generator scrubs every
nondeterministic repr, so any diff means someone changed a public API
without rerunning scripts/gen_api_docs.py)."""
import filecmp
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "scripts"))

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


def test_api_docs_current(tmp_path):
    from gen_api_docs import generate
    out = str(tmp_path / "api")
    written = generate(out)
    assert len(written) >= 14
    checked_in = os.path.join(REPO, "docs", "api")
    for path in written:
        rel = os.path.basename(path)
        have = os.path.join(checked_in, rel)
        assert os.path.exists(have), f"docs/api/{rel} missing — run " \
            "scripts/gen_api_docs.py"
        assert filecmp.cmp(path, have, shallow=False), \
            f"docs/api/{rel} is stale — rerun scripts/gen_api_docs.py"


def test_api_docs_cover_key_components():
    for fname, needles in [
            ("encoders.md", ["TDNNEncoder", "ConformerEncoder",
                             "convnet_layers"]),
            ("models.md", ["Speech2Text", "class `Model"]),
            ("optimizers.md", ["NovoGrad", "poly_decay"]),
            ("ops.md", ["ctc_loss_pallas", "conformer_conv_module"])]:
        with open(os.path.join(REPO, "docs", "api", fname)) as f:
            text = f.read()
        for needle in needles:
            assert needle in text, (fname, needle)
