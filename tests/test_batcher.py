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
import time

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


class _SlowEngine:
    """Engine wrapper adding a fixed DISPATCH delay, making coalescing
    deterministic: the delay holds the dispatcher thread inside
    synthesize_async, so requests submitted meanwhile are GUARANTEED to
    be queued when the dispatcher comes back (no scheduling luck)."""

    def __init__(self, engine, delay_s):
        self._engine = engine
        self._delay_s = delay_s

    @property
    def batch_ladder(self):
        return self._engine.batch_ladder

    def synthesize_async(self, *a, **kw):
        time.sleep(self._delay_s)
        return self._engine.synthesize_async(*a, **kw)


def test_concurrent_requests_coalesce_and_match(engine):
    """4 threads submit together -> after the first (possibly lone)
    dispatch, the rest coalesce during its in-flight run; every result
    equals the unbatched engine output."""
    rng = np.random.default_rng(0)
    utts = [_utt(rng) for _ in range(4)]
    refs = [engine.synthesize(*u) for u in utts]

    b = DynamicBatcher(_SlowEngine(engine, 0.3), window_ms=50.0)
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
        # the barrier releases all 4 within the 300 ms in-flight delay of
        # whatever the first dispatch took, so the stragglers must have
        # shared a dispatch
        assert stats["max_batch"] >= 2
        assert stats["dispatches"] < 4
    finally:
        b.stop()


def test_idle_request_dispatches_immediately(engine):
    """A lone request on an idle batcher must NOT wait out the window:
    the idle fast-path dispatches it at once (the docs' zero-added-
    latency claim)."""
    b = DynamicBatcher(engine, window_ms=2000.0)
    try:
        rng = np.random.default_rng(4)
        utt = _utt(rng)
        b.synthesize(*utt)                      # engine warm-up hit
        t0 = time.perf_counter()
        b.synthesize(*utt)
        lone = time.perf_counter() - t0
        direct_t0 = time.perf_counter()
        engine.synthesize(*utt)
        direct = time.perf_counter() - direct_t0
        # generous: well under the 2 s window, comparable to direct
        assert lone < direct + 1.0, (lone, direct)
        assert b.snapshot()["dispatches"] >= 2
    finally:
        b.stop()


class _SlowFetchEngine:
    """Engine wrapper whose FETCH (not dispatch) is slow: pipelining means
    two batches' fetches overlap on the completion pool."""

    def __init__(self, engine, delay_s):
        self._engine = engine
        self._delay_s = delay_s

    @property
    def batch_ladder(self):
        return self._engine.batch_ladder

    def synthesize_async(self, *a, **kw):
        inner = self._engine.synthesize_async(*a, **kw)

        def fetch():
            time.sleep(self._delay_s)
            return inner()

        return fetch


def test_dispatch_and_fetch_pipeline(engine):
    """Two separate dispatches with 0.4 s fetches must complete in well
    under 0.8 s: the dispatcher hands fetch() to the completion pool and
    immediately dispatches the next batch (the r4 pipelining)."""
    b = DynamicBatcher(_SlowFetchEngine(engine, 0.4), window_ms=1.0)
    try:
        rng = np.random.default_rng(5)
        u1, u2 = _utt(rng), _utt(rng)
        b.synthesize(*u1)                        # warm + prime pool
        results = [None, None]

        def worker(i, u):
            results[i] = b.synthesize(*u)

        t0 = time.perf_counter()
        t1 = threading.Thread(target=worker, args=(0, u1))
        t1.start()
        time.sleep(0.1)       # let dispatch 1 get taken alone
        t2 = threading.Thread(target=worker, args=(1, u2))
        t2.start()
        t1.join(timeout=120)
        t2.join(timeout=120)
        wall = time.perf_counter() - t0
        assert all(r is not None for r in results)
        stats = b.snapshot()
        assert stats["dispatches"] >= 3          # warm + 2 separate
        # serial dispatch->fetch->dispatch->fetch would be >= 0.9 s
        # (0.1 stagger + 2 x 0.4); the pipeline overlaps the fetches
        assert wall < 0.75, (wall, stats)
    finally:
        b.stop()


class _GatedEngine:
    """_SlowEngine that also SIGNALS when the dispatcher enters the slow
    dispatch, so tests can deterministically enqueue while it is busy."""

    def __init__(self, engine, delay_s):
        self._engine = engine
        self._delay_s = delay_s
        self.entered = threading.Event()

    @property
    def batch_ladder(self):
        return self._engine.batch_ladder

    def synthesize_async(self, *a, **kw):
        self.entered.set()
        time.sleep(self._delay_s)
        return self._engine.synthesize_async(*a, **kw)


def test_timeout_dequeue_mid_window_keeps_dispatcher_alive(engine):
    """A request that hits its timeout and self-dequeues while the
    dispatcher is inside the fill window leaves _take_batch returning an
    EMPTY batch with stop unset; the dispatcher must treat that as
    spurious and keep serving (review r4: the old loop read any empty
    batch as shutdown and exited, silently hanging every later request)."""
    gated = _GatedEngine(engine, 0.5)
    b = DynamicBatcher(gated, window_ms=4000.0, request_timeout_s=1.5)
    try:
        rng = np.random.default_rng(6)
        uA, uB, uC = _utt(rng), _utt(rng), _utt(rng)
        res_a = {}

        def first():
            res_a["r"] = b.synthesize(*uA)

        t = threading.Thread(target=first)
        t.start()
        # dispatcher is now held inside A's slow dispatch
        assert gated.entered.wait(timeout=60)
        # B enqueues while the engine is busy -> the dispatcher re-enters
        # _take_batch with was_idle=False and windows for 4 s; B's 1.5 s
        # timeout expires mid-window and it dequeues itself
        with pytest.raises(TimeoutError):
            b.synthesize(*uB)
        t.join(timeout=120)
        assert "r" in res_a      # A itself completed normally
        # let the (now-empty) window expire: the old bug exits _loop here
        time.sleep(4.2)
        assert b._thread.is_alive(), "dispatcher died on the empty batch"
        wav, mel_len = b.synthesize(*uC)          # must still serve
        ref_wavs, ref_len = engine.synthesize(*uC)
        assert mel_len == int(ref_len[0])
        np.testing.assert_allclose(wav, ref_wavs[0], atol=1e-6)
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


def test_server_soak_mixed_endpoints():
    """Soak: 8 clients x 12 mixed requests (synthesize / batch / stream /
    metrics / malformed) against a batching daemon — every response is a
    sane status, and the server leaks neither threads nor sockets."""
    import os
    import threading
    from zerovox_tpu.runtime.server import TTSServer

    params = init_params(CFG, seed=0)
    s = TTSServer(params, CFG, port=0, warmup=True,
                  chunk_frames=16, overlap=8, batch_window_ms=10.0,
                  max_batch=4)
    s.start()
    try:
        host, port = s.address
        rng = np.random.default_rng(7)
        utt = json.dumps({
            "phonemes": rng.integers(1, CFG.num_phonemes,
                                     size=CFG.max_n_phonemes).tolist(),
            "puncts": rng.integers(0, CFG.num_puncts,
                                   size=CFG.max_n_phonemes).tolist(),
            "style": rng.normal(scale=0.05, size=CFG.d_model)
                        .astype(np.float32).tolist(),
        }).encode()
        batch_body = json.dumps(
            {"utterances": [json.loads(utt)] * 2}).encode()
        plan = [("POST", "/synthesize", utt, 200),
                ("POST", "/batch", batch_body, 200),
                ("POST", "/stream", utt, 200),
                ("GET", "/metrics", None, 200),
                ("POST", "/synthesize", b"{]", 400),
                ("POST", "/nope", b"{}", 404)]
        errors = []

        def client(i):
            try:
                for k in range(12):
                    method, path, body, want = plan[(i + k) % len(plan)]
                    c = http.client.HTTPConnection(host, port, timeout=240)
                    if method == "GET":
                        c.request("GET", path)
                    else:
                        c.request("POST", path, body,
                                  {"Content-Type": "application/json"})
                    r = c.getresponse()
                    r.read()
                    if r.status != want:
                        errors.append((i, k, path, r.status, want))
                    c.close()
            except Exception as e:      # noqa: BLE001
                errors.append((i, "exc", repr(e)))

        # settle, then measure baseline AFTER one warm pass of each kind
        for method, path, body, _ in plan:
            c = http.client.HTTPConnection(host, port, timeout=240)
            (c.request("GET", path) if method == "GET"
             else c.request("POST", path, body,
                            {"Content-Type": "application/json"}))
            c.getresponse().read()
            c.close()
        time.sleep(1.0)
        threads_before = threading.active_count()
        fds_before = len(os.listdir("/proc/self/fd"))

        workers = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in workers:
            t.start()
        for t in workers:
            t.join(timeout=600)
        assert not errors, errors[:5]

        time.sleep(2.0)     # let handler threads retire
        assert threading.active_count() <= threads_before + 2, (
            threads_before, threading.active_count())
        assert len(os.listdir("/proc/self/fd")) <= fds_before + 8, (
            fds_before, len(os.listdir("/proc/self/fd")))
    finally:
        s.shutdown()


def test_server_batching_end_to_end():
    """Daemon with batch_window_ms: concurrent /synthesize POSTs all
    succeed, match the direct engine output, and /metrics reports the
    coalescing."""
    from zerovox_tpu.runtime.server import TTSServer

    params = init_params(CFG, seed=0)
    s = TTSServer(params, CFG, port=0, warmup=True,
                  chunk_frames=16, overlap=8, batch_window_ms=50.0)
    # deterministic coalescing: a 300 ms in-flight delay guarantees the
    # concurrent requests are queued when the dispatcher comes back
    s.batcher.engine = _SlowEngine(s.engine, 0.3)
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
        # identical inputs -> same audio across the batch members, to
        # PCM16 resolution (members may run at different batch sizes ->
        # different XLA programs -> last-ulp float drift, +/-1 LSB after
        # quantisation)
        for p in pcms[1:]:
            np.testing.assert_allclose(p, pcms[0], atol=1)

        c = http.client.HTTPConnection(host, port, timeout=60)
        c.request("GET", "/metrics")
        m = json.loads(c.getresponse().read())
        assert m["batcher"]["requests"] >= 3
        assert m["batcher"]["max_batch"] >= 2
    finally:
        s.shutdown()
