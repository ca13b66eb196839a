"""`cli --verify`: the user-checkpoint parity tool (VERDICT r4 #8).

Generalizes the stage differential harness into a shippable command:
compiles the reference's own C++ classes, loads the SAME user GGUF into
both implementations, and diffs the three eval() boundaries
(/root/reference/src/fs2encoder.cpp:594, stylettsdec.cpp:457,
hifigan.cpp:358).  These tests check the tool itself: PASS on a faithful
checkpoint, FAIL (exit 1) when weights genuinely diverge, and exit 2 when
the reference harness cannot be built.
"""

import numpy as np
import pytest

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.params import load_params, save_params
from zerovox_tpu.refharness.build import get_stage_harness

from oracles.synthetic import build_synthetic_gguf

LIB, SKIP_REASON = get_stage_harness()
pytestmark = pytest.mark.skipif(
    LIB is None, reason=f"reference stage harness unavailable: {SKIP_REASON}")


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("verify") / "tiny.gguf")
    build_synthetic_gguf(path, TINY_CONFIG, seed=11, duration_bias=1.5)
    return path


def test_verify_passes_on_faithful_checkpoint(tiny_gguf):
    from zerovox_tpu.cli import main
    assert main(["--model", tiny_gguf, "--verify"]) == 0


def test_verify_passes_on_save_params_roundtrip(tiny_gguf, tmp_path):
    """A GGUF re-written by OUR writer must still verify against the
    reference classes — this is the reference-compatibility gate on
    save_params (it caught the all-f32 conv-kernel bug: ggml's im2col
    hard-asserts F16 kernels, so an f32 file loads but aborts the first
    graph compute)."""
    cfg, params = load_params(tiny_gguf)
    rt = str(tmp_path / "roundtrip.gguf")
    save_params(rt, params, cfg)
    from zerovox_tpu.cli import main
    assert main(["--model", rt, "--verify"]) == 0


def test_verify_detects_implementation_divergence(tiny_gguf, monkeypatch):
    """The tool verifies IMPLEMENTATION parity (both sides load the same
    file), so its sensitivity test injects a divergence on our side: a
    biased decoder must trip exactly the decoder boundary while the
    encoder stays green, and the CLI must exit 1."""
    from zerovox_tpu.models import styletts_decoder
    from zerovox_tpu.utils import verify as verify_mod

    real_decode = styletts_decoder.decode
    # verify_checkpoint imports the module inside the function, so patching
    # the module attribute is seen by the tool
    monkeypatch.setattr(styletts_decoder, "decode",
                        lambda *a, **k: real_decode(*a, **k) + 0.05)

    report = verify_mod.verify_checkpoint(tiny_gguf, log=lambda m: None)
    assert not report.ok
    by_name = {b.name.split(" ")[0]: b for b in report.boundaries}
    assert by_name["encoder"].ok
    assert not by_name["decoder"].ok
    assert "FAIL" in report.summary()
