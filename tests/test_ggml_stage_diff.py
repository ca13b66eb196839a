"""Stage-level differential tests against the REFERENCE'S OWN C++ model
classes.

zerovox_tpu/refharness/stage_harness.cpp compiles the reference's FS2Encoder
(/root/reference/src/fs2encoder.cpp:477-656), StyleTTSDecoder
(/root/reference/src/stylettsdec.cpp:306-470) and HiFiGAN
(/root/reference/src/hifigan.cpp:187-377) UNMODIFIED against the vendored
ggml build, loads a synthetic GGUF written by our own converter, and runs
each stage's real graph.  These tests diff our jax stages against those
eval() boundaries — the only place a composition or name-mapping bug can
still hide after op-level parity (tests/test_ggml_diff.py).

Our side runs the f32 parity path under f16_staging (the simulation of
ggml's f16 conv weights + f16 im2col, ops/conv.py:29-46).  Measured
deviations at TINY: encoder 5e-7, decoder 8e-4, vocoder 4e-5 — tolerances
below are ~5x those bands (ledger: docs/ARCHITECTURE.md §10).

The discrete paths (duration rounding fs2encoder.cpp:624-625, pitch/energy
bucketize :442-474) would make the diff flaky if a prediction sat exactly on
a rounding boundary; the fixtures assert a safety margin so seed drift is
reported as such instead of as a spurious mismatch.

The reference classes run in a dedicated WORKER SUBPROCESS
(zerovox_tpu/refharness/stage_proc.py): they assume a fresh process — the zero-stuff
ConvTranspose gaps are never memset (hifigan.cpp:50-55) and graph metadata
lives in function-local statics — and sharing a long-lived pytest heap with
jax/orbax/torch broke those assumptions nondeterministically (NaN wav
samples whenever checkpoint tests ran first).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zerovox_tpu.config import TINY_CONFIG, ZeroVoxConfig
from zerovox_tpu.models import fs2_encoder, hifigan, styletts_decoder
from zerovox_tpu.models.pipeline import synthesize
from zerovox_tpu.ops.conv import f16_staging
from zerovox_tpu.ops.length_regulator import (durations_from_log,
                                              length_regulate)
from zerovox_tpu.params import load_params

from zerovox_tpu.refharness.build import get_stage_harness
from zerovox_tpu.refharness.stage_proc import RefStages
from oracles.synthetic import build_synthetic_gguf

LIB, SKIP_REASON = get_stage_harness()
pytestmark = pytest.mark.skipif(
    LIB is None, reason=f"reference stage harness unavailable: {SKIP_REASON}")


def _inputs(cfg: ZeroVoxConfig, seed=7):
    rng = np.random.default_rng(seed)
    P = cfg.max_n_phonemes
    src = rng.integers(1, cfg.num_phonemes, size=P).astype(np.int32)
    pun = rng.integers(0, cfg.num_puncts, size=P).astype(np.int32)
    style = rng.normal(scale=0.1, size=cfg.d_model).astype(np.float32)
    return src, pun, style


def _assert_duration_margin(log_dur, min_margin=1e-3):
    """Distance of exp(ld)-1+0.5 from an integer decides the reference's
    (int32) cast (fs2encoder.cpp:624-625); require a margin so f16 noise
    cannot flip a rounding and shift the whole expanded sequence."""
    d = np.exp(np.asarray(log_dur, dtype=np.float64)) - 1.0 + 0.5
    margin = np.abs(d - np.round(d)).min()
    assert margin > min_margin, (
        f"duration rounding margin {margin:.2e} too small for a stable "
        f"differential test — pick a different fixture seed")


@pytest.fixture(scope="module")
def tiny_stage(tmp_path_factory):
    cfg = TINY_CONFIG
    path = str(tmp_path_factory.mktemp("stagediff") / "tiny.gguf")
    torch_modules = build_synthetic_gguf(path, cfg, seed=11,
                                         duration_bias=1.5)
    ref = RefStages(LIB, path, cfg)
    _, params = load_params(path)
    yield cfg, params, ref
    ref.free()
    del torch_modules


def test_stage_encoder_diff(tiny_stage):
    """Our encoder + length regulator == the reference FS2Encoder::eval
    (features through variance adaptors, host LR loop incl. zero-pad tail,
    fs2encoder.cpp:594-655)."""
    cfg, params, ref = tiny_stage
    src, pun, style = _inputs(cfg)
    P = cfg.max_n_phonemes

    ref_x, ref_len = ref.encoder(src, pun, style, P)

    with f16_staging():
        feat, log_dur = jax.jit(
            lambda s, p, st: fs2_encoder.encode(params, cfg, s, p, st))(
                jnp.asarray(src[None]), jnp.asarray(pun[None]),
                jnp.asarray(style[None]))
    _assert_duration_margin(log_dur[0])
    dur = durations_from_log(log_dur, cfg.max_seq_len)
    hidden, total = length_regulate(feat, dur, cfg.max_seq_len)

    assert int(total[0]) == ref_len
    assert ref_len > cfg.max_seq_len // 4        # non-trivial expansion
    np.testing.assert_allclose(np.asarray(hidden[0], dtype=np.float32),
                               ref_x, atol=5e-5, rtol=1e-4)


def test_stage_encoder_truncation(tiny_stage):
    """num_phonemes < P and the max_seq_len mid-repeat truncation both match
    the reference loop's break semantics (fs2encoder.cpp:632-640)."""
    cfg, params, ref = tiny_stage
    src, pun, style = _inputs(cfg, seed=9)
    nph = cfg.max_n_phonemes // 2

    ref_x, ref_len = ref.encoder(src, pun, style, nph)

    with f16_staging():
        feat, log_dur = jax.jit(
            lambda s, p, st: fs2_encoder.encode(params, cfg, s, p, st))(
                jnp.asarray(src[None]), jnp.asarray(pun[None]),
                jnp.asarray(style[None]))
    _assert_duration_margin(log_dur[0, :nph])
    dur = durations_from_log(log_dur, cfg.max_seq_len)
    hidden, total = length_regulate(feat, dur, cfg.max_seq_len,
                                    num_phonemes=jnp.asarray([nph]))

    assert int(total[0]) == ref_len
    np.testing.assert_allclose(np.asarray(hidden[0], dtype=np.float32),
                               ref_x, atol=5e-5, rtol=1e-4)


def test_stage_decoder_diff(tiny_stage):
    """Our StyleTTS decoder == the reference StyleTTSDecoder::eval on an
    identical hidden-state input (stylettsdec.cpp:457-470)."""
    cfg, params, ref = tiny_stage
    rng = np.random.default_rng(3)
    hidden = rng.normal(size=(cfg.max_seq_len, cfg.d_model)).astype(np.float32)
    style = rng.normal(scale=0.1, size=cfg.d_model).astype(np.float32)

    ref_mel = ref.decoder(hidden, style)
    with f16_staging():
        mel = jax.jit(lambda h, s: styletts_decoder.decode(params, cfg, h, s))(
            jnp.asarray(hidden[None]), jnp.asarray(style[None]))
    np.testing.assert_allclose(np.asarray(mel[0], dtype=np.float32), ref_mel,
                               atol=5e-3, rtol=1e-3)


def test_stage_hifigan_diff(tiny_stage):
    """Our vocoder (measured dispatch path) == the reference HiFiGAN::eval
    incl. the mean/scale denorm and zero-stuff ConvTranspose chain
    (hifigan.cpp:236-355)."""
    cfg, params, ref = tiny_stage
    rng = np.random.default_rng(4)
    mean = np.asarray(params["vocoder"]["mean"])
    scale = np.asarray(params["vocoder"]["scale"])
    mel = (rng.normal(size=(cfg.max_seq_len, cfg.num_mels)) * scale
           + mean).astype(np.float32)

    ref_wav = ref.vocoder(mel)
    with f16_staging():
        wav = jax.jit(lambda m: hifigan.vocode(params, cfg, m))(
            jnp.asarray(mel[None]))
    np.testing.assert_allclose(np.asarray(wav[0], dtype=np.float32), ref_wav,
                               atol=1e-3, rtol=1e-3)


def test_stage_full_chain_diff(tiny_stage):
    """Chained encoder->decoder->vocoder: the reference's three eval() calls
    (zerovox.cpp:198-335) vs our single jitted synthesize()."""
    cfg, params, ref = tiny_stage
    src, pun, style = _inputs(cfg)
    P = cfg.max_n_phonemes

    ref_x, ref_len = ref.encoder(src, pun, style, P)
    ref_mel = ref.decoder(ref_x, style)
    ref_wav = ref.vocoder(ref_mel)

    with f16_staging():
        out = jax.jit(lambda s, p, st: synthesize(params, cfg, s, p, st))(
            jnp.asarray(src[None]), jnp.asarray(pun[None]),
            jnp.asarray(style[None]))
    _assert_duration_margin(out.log_duration[0])

    assert int(out.mel_len[0]) == ref_len
    np.testing.assert_allclose(np.asarray(out.mel[0], dtype=np.float32),
                               ref_mel, atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.wav[0], dtype=np.float32),
                               ref_wav, atol=2e-2, rtol=1e-2)
