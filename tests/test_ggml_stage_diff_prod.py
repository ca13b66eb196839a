"""Production-geometry differential tests against the reference's own C++
stage classes (see tests/test_ggml_stage_diff.py for the TINY suite and the
harness description).

Runs the DEFAULT ZeroVoxConfig geometry (P=120, d=528, 4 FFT layers, T=1500,
hop 300, ve_n_bins=256 — the values hardcoded in
/root/reference/src/zerovox.cpp:108-138 and zerovox.h:35-37) through both
sides at each stage's eval() boundary.

Why staged handoffs and not one chained bitwise diff: the variance adaptor
quantizes pitch/energy predictions onto a 256-bucket integer grid
(/root/reference/src/fs2encoder.cpp:442-474).  At production depth the
irreducible f16-accumulation-order deviation between our XLA kernels and
ggml's is ~3e-5 on the predictions — ~8e-3 bucket units — so a handful of
the 240 bucket decisions per utterance land inside that band and flip,
and each flipped phoneme swaps in a different N(0,1) embedding row.  The
decoder's InstanceNorms then smear that O(1) local difference over the whole
padded time axis.  No fixture seed fixes this (P(all 240 margins clear) is
astronomically small at 256 bins).  Instead:

  * the ENCODER diff is flip-aware: every phoneme whose frames disagree
    must be EXPLAINED post-hoc as an embedding-row swap (diff == the exact
    difference of two pitch/energy embedding rows) at a decision our own
    taps place near its boundary (or downstream of one, via the energy
    predictor's +-2-phoneme receptive field); everything else must match
    tightly, and the host length-regulator expansion must agree exactly
    (duration margins are asserted; durations are predicted before any
    bucketized add).  A composition or name-mapping bug cannot fake that.
  * the DECODER and VOCODER diffs feed both sides identical inputs (the
    reference's own stage outputs), so they are exact production-geometry
    graph diffs with no discrete sensitivity.

Ledger: docs/ARCHITECTURE.md §10.  Kept in its own module: the stage harness
holds one loaded model per process at a time (function-local static graph
buffers, fs2encoder.cpp:514-515), and module-scoped fixtures tear down
between files.  Cost: ~3 min on one CPU core (173 MB GGUF + 4 stage runs).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.models import fs2_encoder, hifigan, styletts_decoder
from zerovox_tpu.ops.conv import f16_staging
from zerovox_tpu.ops.length_regulator import (durations_from_log,
                                              length_regulate)
from zerovox_tpu.params import load_params
from zerovox_tpu.utils.debug import capture_run

from zerovox_tpu.refharness.build import get_stage_harness
from oracles.synthetic import build_synthetic_gguf
from test_ggml_stage_diff import RefStages, _assert_duration_margin, _inputs

LIB, SKIP_REASON = get_stage_harness()
pytestmark = pytest.mark.skipif(
    LIB is None, reason=f"reference stage harness unavailable: {SKIP_REASON}")

# scanned: duration margin 5.4e-3 frames, 691 mel frames (non-trivial,
# below the T=1500 cap)
GGUF_SEED, INPUT_SEED = 25, 7


@pytest.fixture(scope="module")
def prod_stage(tmp_path_factory):
    cfg = ZeroVoxConfig()
    path = str(tmp_path_factory.mktemp("stagediff_prod") / "prod.gguf")
    torch_modules = build_synthetic_gguf(path, cfg, seed=GGUF_SEED,
                                         duration_bias=1.5)
    ref = RefStages(LIB, path, cfg)
    _, params = load_params(path)
    yield cfg, params, ref
    ref.free()
    del torch_modules


def _bucket_margins(pred, n_bins):
    """Distance of pred*(n_bins-1) from its nearest bucket DECISION boundary.

    bucket = clamp(floor(v + 0.5), 0, n_bins-1) (fs2encoder.cpp:466-472), so
    boundaries sit at HALF-integers of v, and values in the clamp regions
    have no nearby boundary at all (clipping v to [0, n_bins-1] maps them to
    margin 0.5)."""
    v = np.asarray(pred, dtype=np.float64).reshape(-1) * (n_bins - 1)
    v = np.clip(v, 0.0, float(n_bins - 1))
    return np.abs((v - np.floor(v)) - 0.5)


def test_stage_encoder_diff_production(prod_stage):
    """Our encoder + length regulator vs the reference FS2Encoder::eval at
    production geometry (fs2encoder.cpp:594-655): the LR expansion must agree
    exactly, and every frame-level disagreement must be explained by a
    near-boundary pitch/energy bucket decision."""
    cfg, params, ref = prod_stage
    src, pun, style = _inputs(cfg, seed=INPUT_SEED)
    P = cfg.max_n_phonemes

    ref_x, ref_len = ref.encoder(src, pun, style, P)

    with f16_staging():
        (feat, log_dur), taps = capture_run(
            lambda s, p, st: fs2_encoder.encode(params, cfg, s, p, st),
            jnp.asarray(src[None]), jnp.asarray(pun[None]),
            jnp.asarray(style[None]))
    _assert_duration_margin(log_dur[0], min_margin=2e-3)
    dur = durations_from_log(log_dur, cfg.max_seq_len)
    hidden, total = length_regulate(feat, dur, cfg.max_seq_len)

    assert int(total[0]) == ref_len
    assert ref_len > cfg.max_seq_len // 4          # non-trivial expansion

    # ---- post-hoc flip explanation -------------------------------------
    # Map frames back to phonemes via the (verified identical) durations,
    # find every phoneme whose frames disagree, and demand that each diff is
    # EXACTLY an embedding-row swap: d == (pitch_emb[b'] - pitch_emb[b])
    #                                    + (energy_emb[e'] - energy_emb[e])
    # with the implicated decision near its boundary (or, for the energy
    # component, within the energy predictor's +-2-phoneme receptive field
    # of a pitch flip, whose swapped row perturbs the energy input
    # arbitrarily).  A composition/name-mapping bug cannot satisfy this.
    n = cfg.ve_n_bins
    pitch_m = _bucket_margins(taps["pitch"][0], n)
    energy_m = _bucket_margins(taps["energy"][0], n)
    pe = np.asarray(params["encoder"]["pitch_emb"], np.float64)
    ee = np.asarray(params["encoder"]["energy_emb"], np.float64)
    from zerovox_tpu.ops.misc import bucketize
    pb = np.asarray(bucketize(taps["pitch"], n)).reshape(-1)
    eb = np.asarray(bucketize(taps["energy"], n)).reshape(-1)

    dur_h = np.asarray(dur[0]).astype(int)
    starts = np.concatenate([[0], np.cumsum(dur_h)[:-1]]).astype(int)
    h = np.asarray(hidden[0], dtype=np.float32)
    fdiff = np.abs(h - ref_x).max(axis=1)

    bad, clean_frames = [], np.ones(cfg.max_seq_len, bool)
    for i in range(P):
        lo, hi = starts[i], min(starts[i] + dur_h[i], cfg.max_seq_len)
        if hi > lo and fdiff[lo:hi].max() > 1e-3:
            bad.append(i)
            clean_frames[lo:hi] = False
    assert len(bad) <= P // 6, (
        f"{len(bad)}/{P} phonemes disagree — far more than bucket-boundary "
        f"flips can explain: {bad}")

    pitch_flipped = set()
    for i in bad:
        d = ref_x[starts[i]].astype(np.float64) \
            - np.asarray(feat[0][i], np.float64)
        best = (np.inf, 0, eb[i])
        for dp in range(-2, 3):
            b2 = int(np.clip(pb[i] + dp, 0, n - 1))
            rem = d - (pe[b2] - pe[pb[i]])
            # the energy swap may be arbitrary at contaminated phonemes:
            # search every row (vectorized)
            res = np.abs((ee - ee[eb[i]]) - rem).max(axis=1)
            e2 = int(res.argmin())
            if res[e2] < best[0]:
                best = (res[e2], b2 - pb[i], e2)
        residual, dp, _ = best
        assert residual < 5e-3, (
            f"phoneme {i}: feature diff (max {np.abs(d).max():.3f}) is NOT "
            f"an embedding-row swap (best residual {residual:.3e}) — a real "
            f"numeric/composition divergence")
        if dp != 0:
            # pitch preds see no bucketized inputs, so a pitch flip must be
            # near ITS OWN boundary
            assert pitch_m[i] < 0.1, (
                f"phoneme {i}: pitch bucket swapped by {dp} at margin "
                f"{pitch_m[i]:.3f} — too far from a boundary to be a flip")
            pitch_flipped.add(i)
    for i in bad:
        if i in pitch_flipped or any(abs(i - j) <= 2 for j in pitch_flipped):
            continue    # energy input perturbed by the flipped pitch row
        assert energy_m[i] < 0.1, (
            f"phoneme {i}: energy bucket swapped at margin {energy_m[i]:.3f} "
            f"with no nearby pitch flip — a real numeric divergence")

    # the clean frames (and the zero-padded tail) must match tightly
    # (TINY band was 5e-7; 3 orders of headroom for production depth)
    np.testing.assert_allclose(h[clean_frames], ref_x[clean_frames],
                               atol=5e-4, rtol=1e-3)


def test_stage_decoder_diff_production(prod_stage):
    """Our StyleTTS decoder vs StyleTTSDecoder::eval on the reference's own
    encoder output — an exact production-geometry graph diff
    (stylettsdec.cpp:457-470)."""
    cfg, params, ref = prod_stage
    src, pun, style = _inputs(cfg, seed=INPUT_SEED)
    hidden, _ = ref.encoder(src, pun, style, cfg.max_n_phonemes)

    ref_mel = ref.decoder(hidden, style)
    with f16_staging():
        mel = jax.jit(lambda h, s: styletts_decoder.decode(params, cfg, h, s))(
            jnp.asarray(hidden[None]), jnp.asarray(style[None]))
    np.testing.assert_allclose(np.asarray(mel[0], dtype=np.float32), ref_mel,
                               atol=5e-3, rtol=1e-3)


def test_stage_hifigan_diff_production(prod_stage):
    """Our vocoder (measured dispatch path) vs HiFiGAN::eval on the
    reference's own mel — an exact production-geometry graph diff, T=1500,
    450k samples (hifigan.cpp:236-377)."""
    cfg, params, ref = prod_stage
    src, pun, style = _inputs(cfg, seed=INPUT_SEED)
    hidden, _ = ref.encoder(src, pun, style, cfg.max_n_phonemes)
    ref_mel = ref.decoder(hidden, style)

    ref_wav = ref.vocoder(ref_mel)
    with f16_staging():
        wav = jax.jit(lambda m: hifigan.vocode(params, cfg, m))(
            jnp.asarray(ref_mel[None]))
    np.testing.assert_allclose(np.asarray(wav[0], dtype=np.float32), ref_wav,
                               atol=2e-3, rtol=1e-3)
