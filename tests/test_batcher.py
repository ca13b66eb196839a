"""Dynamic request batching (runtime/batcher.py).

Concurrent one-shot requests must coalesce into packed dispatches with
per-utterance results identical to the unbatched engine path, failures
must propagate to every waiter, and the daemon integration must expose
batcher stats through /metrics.
"""

import http.client
import json
import struct
import threading

import numpy as np
import pytest

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.params import init_params
from zerovox_tpu.runtime.batcher import DynamicBatcher
from zerovox_tpu.runtime.engine import TTSEngine

CFG = TINY_CONFIG


@pytest.fixture(scope="module")
def engine():
    e = TTSEngine(init_params(CFG, seed=0), CFG, mel_buckets=(16, 32))
    e.warmup(batch=e.batch_ladder[-1])
    return e


def _utt(rng):
    P = CFG.max_n_phonemes
    return (rng.integers(1, CFG.num_phonemes, size=(1, P)).astype(np.int32),
            rng.integers(0, CFG.num_puncts, size=(1, P)).astype(np.int32),
            rng.normal(scale=0.1, size=(1, CFG.d_model)).astype(np.float32),
            np.asarray([P], np.int32))


def test_concurrent_requests_coalesce_and_match(engine):
    """4 threads submit inside one generous window -> at least one packed
    dispatch, and every result equals the unbatched engine output."""
    rng = np.random.default_rng(0)
    utts = [_utt(rng) for _ in range(4)]
    refs = [engine.synthesize(*u) for u in utts]

    b = DynamicBatcher(engine, window_ms=500.0)
    try:
        results = [None] * 4
        barrier = threading.Barrier(4)

        def worker(i):
            barrier.wait()
            results[i] = b.synthesize(*utts[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        for (wav, mel_len), (ref_wavs, ref_len) in zip(results, refs):
            assert mel_len == int(ref_len[0])
            np.testing.assert_allclose(wav, ref_wavs[0], atol=1e-6)
        stats = b.snapshot()
        assert stats["requests"] == 4
        # all 4 were in flight before the 500 ms window closed, so they
        # must have shared dispatches (the barrier makes this determined,
        # not timing luck, unless a worker stalls >window — in which case
        # max_batch==1 and dispatches==4 would fail here loudly)
        assert stats["max_batch"] >= 2
        assert stats["dispatches"] < 4
    finally:
        b.stop()


def test_batcher_propagates_failures(engine):
    """A dispatch failure must reach every waiter as a raised exception,
    not a hang."""
    b = DynamicBatcher(engine, window_ms=1.0)
    try:
        bad_style = np.zeros((1, CFG.d_model + 3), np.float32)  # wrong dim
        rng = np.random.default_rng(1)
        src, pun, _, n = _utt(rng)
        with pytest.raises(Exception):
            b.synthesize(src, pun, bad_style, n)
    finally:
        b.stop()


def test_batcher_rejects_multi_utterance(engine):
    b = DynamicBatcher(engine, window_ms=1.0)
    try:
        rng = np.random.default_rng(2)
        src, pun, style, n = _utt(rng)
        with pytest.raises(ValueError, match="B=1"):
            b.synthesize(np.repeat(src, 2, 0), np.repeat(pun, 2, 0),
                         np.repeat(style, 2, 0), np.repeat(n, 2))
    finally:
        b.stop()


def test_server_batching_end_to_end():
    """Daemon with batch_window_ms: concurrent /synthesize POSTs all
    succeed, match the direct engine output, and /metrics reports the
    coalescing."""
    from zerovox_tpu.runtime.server import TTSServer

    params = init_params(CFG, seed=0)
    s = TTSServer(params, CFG, port=0, warmup=True,
                  chunk_frames=16, overlap=8, batch_window_ms=300.0)
    s.start()
    try:
        host, port = s.address
        rng = np.random.default_rng(3)
        utt = {
            "phonemes": rng.integers(1, CFG.num_phonemes,
                                     size=CFG.max_n_phonemes).tolist(),
            "puncts": rng.integers(0, CFG.num_puncts,
                                   size=CFG.max_n_phonemes).tolist(),
            "style": rng.normal(scale=0.05, size=CFG.d_model)
                        .astype(np.float32).tolist(),
        }
        body = json.dumps(utt).encode()

        results = [None] * 3
        barrier = threading.Barrier(3)

        def worker(i):
            barrier.wait()
            c = http.client.HTTPConnection(host, port, timeout=240)
            c.request("POST", "/synthesize?trim=0", body,
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            results[i] = (r.status, r.read())

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)

        pcms = []
        for status, raw in results:
            assert status == 200
            assert raw[:4] == b"RIFF"
            assert struct.unpack("<I", raw[24:28])[0] == CFG.sampling_rate
            pcms.append(np.frombuffer(raw[44:], dtype=np.int16))
        # identical inputs -> identical audio across the batch members
        for p in pcms[1:]:
            np.testing.assert_array_equal(p, pcms[0])

        c = http.client.HTTPConnection(host, port, timeout=60)
        c.request("GET", "/metrics")
        m = json.loads(c.getresponse().read())
        assert m["batcher"]["requests"] >= 3
        assert m["batcher"]["max_batch"] >= 2
    finally:
        s.shutdown()
