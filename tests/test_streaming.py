"""Streaming vocoder: chunked output must match the full run exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.models import hifigan
from zerovox_tpu.models.pipeline import synthesize
from zerovox_tpu.models.streaming import StreamingSynthesizer
from zerovox_tpu.params import init_params

CFG = TINY_CONFIG


@pytest.mark.parametrize("chunk,overlap", [(16, 8), (8, 8), (32, 16)])
def test_chunked_vocoder_matches_full(rng, chunk, overlap):
    """Central-region equivalence: overlap >= receptive field => chunked
    vocoding is numerically identical to the full run."""
    params = init_params(CFG, seed=0)
    B, T = 1, CFG.max_seq_len
    mel = jnp.asarray(rng.normal(size=(B, T, CFG.num_mels)), jnp.float32)

    full = np.asarray(hifigan.vocode(params, CFG, mel))

    s = StreamingSynthesizer(params, CFG, chunk_frames=chunk, overlap=overlap)
    n_chunks = -(-T // chunk)
    out = np.concatenate(
        [np.asarray(c) for c in s.vocode_chunks(mel, n_chunks)], axis=1)

    np.testing.assert_allclose(out[:, :full.shape[1]], full, atol=2e-5, rtol=1e-4)


def test_insufficient_overlap_detectable(rng):
    """With overlap=0 the chunk boundaries must diverge from the full run —
    confirms the parity test above is actually sensitive."""
    params = init_params(CFG, seed=0)
    mel = jnp.asarray(rng.normal(size=(1, CFG.max_seq_len, CFG.num_mels)),
                      jnp.float32)
    full = np.asarray(hifigan.vocode(params, CFG, mel))

    s = StreamingSynthesizer(params, CFG, chunk_frames=16, overlap=0)
    n_chunks = -(-CFG.max_seq_len // 16)
    out = np.concatenate(
        [np.asarray(c) for c in s.vocode_chunks(mel, n_chunks)], axis=1)
    assert np.abs(out[:, :full.shape[1]] - full).max() > 1e-4


def test_stream_end_to_end(rng):
    params = init_params(CFG, seed=0)
    B = 1
    src = rng.integers(0, CFG.num_phonemes + 1, size=(B, CFG.max_n_phonemes))
    pun = rng.integers(0, CFG.num_puncts + 1, size=(B, CFG.max_n_phonemes))
    style = rng.normal(scale=0.1, size=(B, CFG.d_model)).astype(np.float32)

    s = StreamingSynthesizer(params, CFG, chunk_frames=16, overlap=8)
    chunks = list(s.stream(src, pun, style))
    assert len(chunks) >= 1
    for c in chunks:
        assert c.shape == (B, 16 * CFG.hop_size)
        assert np.isfinite(c).all()

    # must agree with the one-shot pipeline on the emitted region
    ref = synthesize(params, CFG, jnp.asarray(src), jnp.asarray(pun),
                     jnp.asarray(style))
    wav = np.concatenate(chunks, axis=1)
    n = min(wav.shape[1], ref.wav.shape[1])
    np.testing.assert_allclose(wav[:, :n], np.asarray(ref.wav)[:, :n],
                               atol=2e-5, rtol=1e-4)
