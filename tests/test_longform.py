"""Long-form synthesis (runtime/longform.py).

The reference truncates utterances at MAX_N_PHONEMES
(/root/reference/src/zerovox.h:37); here over-long utterances split at
punctuation boundaries into one packed engine dispatch and the
waveforms concatenate.  Pins: the split geometry (punct preference,
hard-cap fallback, partition property), equality with per-window
synthesis, and the daemon's ?split=1 mode.
"""

import http.client
import json

import numpy as np
import pytest

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.params import init_params
from zerovox_tpu.runtime.engine import TTSEngine
from zerovox_tpu.runtime.longform import (split_points, split_utterance,
                                          synthesize_long)

CFG = TINY_CONFIG


def test_split_points_prefers_punctuation():
    # cap 8; puncts mark prosodic breaks at 3 and 9 (0-based)
    pu = [0, 0, 0, 2, 0, 0, 0, 0, 0, 1, 0, 0]
    ends = split_points(pu, n=12, cap=8)
    # window 1 ends after the last punct within the first 8 -> index 4;
    # the remaining 8 fit in one window
    assert ends == [4, 12]


def test_split_points_hard_cap_without_punctuation():
    ends = split_points([0] * 20, n=20, cap=8)
    assert ends == [8, 16, 20]


def test_split_points_partitions_everything():
    rng = np.random.default_rng(0)
    for n in (1, 7, 8, 9, 100):
        pu = rng.integers(0, 3, size=n)
        ends = split_points(pu, n=n, cap=8)
        assert ends[-1] == n
        prev = 0
        for e in ends:
            assert 1 <= e - prev <= 8
            prev = e


def test_split_utterance_shapes():
    cap = CFG.max_n_phonemes
    n = int(cap * 2.5)
    rng = np.random.default_rng(1)
    ph = rng.integers(1, CFG.num_phonemes, size=n)
    pu = rng.integers(0, CFG.num_puncts, size=n)
    src, pun, lens = split_utterance(ph, pu, cap)
    assert src.shape == pun.shape == (len(lens), cap)
    assert int(lens.sum()) == n
    # round-trip: concatenating the unpadded windows recovers the input
    back = np.concatenate([src[i, :lens[i]] for i in range(len(lens))])
    np.testing.assert_array_equal(back, ph.astype(np.int32))


@pytest.fixture(scope="module")
def engine():
    return TTSEngine(init_params(CFG, seed=0), CFG, mel_buckets=(16, 32))


def test_synthesize_long_matches_per_window(engine):
    cap = CFG.max_n_phonemes
    n = int(cap * 2.5)
    rng = np.random.default_rng(2)
    ph = rng.integers(1, CFG.num_phonemes, size=n)
    pu = rng.integers(0, CFG.num_puncts, size=n)
    style = rng.normal(scale=0.1, size=(1, CFG.d_model)).astype(np.float32)

    wav, mel_len = synthesize_long(engine, ph, pu, style)

    src, pun, lens = split_utterance(ph, pu, cap)
    parts = []
    for i in range(len(lens)):
        w, _ = engine.synthesize(src[i:i + 1], pun[i:i + 1], style,
                                 num_phonemes=lens[i:i + 1])
        parts.append(w[0])
    ref = np.concatenate(parts)
    assert len(wav) == len(ref)
    np.testing.assert_allclose(wav, ref, atol=1e-6)


def test_synthesize_long_window_cap(engine):
    """max_windows bounds the device work one call can mint (review r4:
    each split window is a full utterance of dispatches, so a server
    exposing this path must cap it like /batch).  Over-cap splits raise
    ValueError BEFORE any device work; at-cap splits pass through."""
    cap = CFG.max_n_phonemes
    n = cap * 3 + 1                                    # 4 hard-cap windows
    rng = np.random.default_rng(9)
    ph = rng.integers(1, CFG.num_phonemes, size=n)
    pu = np.zeros(n, np.int64)                         # no puncts: 4 windows
    style = rng.normal(scale=0.05,
                       size=(1, CFG.d_model)).astype(np.float32)
    with pytest.raises(ValueError, match="windows"):
        synthesize_long(engine, ph, pu, style, max_windows=3)
    wav, mel_len = synthesize_long(engine, ph, pu, style, max_windows=4)
    assert len(mel_len) == 4 and wav.size > 0


def test_server_split_mode():
    """?split=1 accepts an over-long utterance (plain /synthesize rejects
    it with 400) and returns the concatenated WAV."""
    from zerovox_tpu.runtime.server import TTSServer

    params = init_params(CFG, seed=0)
    s = TTSServer(params, CFG, port=0, warmup=True,
                  chunk_frames=16, overlap=8)
    s.start()
    try:
        host, port = s.address
        rng = np.random.default_rng(3)
        n = int(CFG.max_n_phonemes * 2.5)
        utt = {
            "phonemes": rng.integers(1, CFG.num_phonemes, size=n).tolist(),
            "puncts": rng.integers(0, CFG.num_puncts, size=n).tolist(),
            "style": rng.normal(scale=0.05, size=CFG.d_model)
                        .astype(np.float32).tolist(),
        }
        body = json.dumps(utt).encode()
        c = http.client.HTTPConnection(host, port, timeout=240)
        c.request("POST", "/synthesize", body,
                  {"Content-Type": "application/json"})
        assert c.getresponse().status == 400     # over the cap, no split

        c = http.client.HTTPConnection(host, port, timeout=240)
        c.request("POST", "/synthesize?split=1", body,
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200
        raw = r.read()
        assert raw[:4] == b"RIFF"
        pcm = np.frombuffer(raw[44:], dtype=np.int16)
        # equality with the library path (engine pcm16 output)
        eng = s.engine
        wav, _ = synthesize_long(eng, utt["phonemes"], utt["puncts"],
                                 np.asarray(utt["style"], np.float32),
                                 pcm16=True)
        np.testing.assert_array_equal(pcm, wav)

        # long-form STREAMING: /stream?split=1 streams every window in
        # turn; the de-chunked audio equals the per-window stream collects
        c = http.client.HTTPConnection(host, port, timeout=240)
        c.request("POST", "/stream?split=1", body,
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200
        raw = r.read()                     # http.client de-chunks
        stream_pcm = np.frombuffer(raw[44:], dtype=np.int16)
        from zerovox_tpu.runtime.longform import split_utterance
        srcs, puns, lens = split_utterance(
            utt["phonemes"], utt["puncts"], CFG.max_n_phonemes)
        style = np.asarray(utt["style"], np.float32).reshape(1, -1)
        parts = []
        for i in range(len(lens)):
            for piece in s.stream.stream(srcs[i:i + 1], puns[i:i + 1],
                                         style, lens[i:i + 1]):
                parts.append(np.asarray(piece).ravel())   # (1, N) chunks
        ref = np.concatenate(parts) if parts else np.zeros(0, np.int16)
        np.testing.assert_array_equal(stream_pcm, ref)
    finally:
        s.shutdown()
