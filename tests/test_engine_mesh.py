"""Pure-DP mesh serving: TTSEngine(mesh=...) on the virtual device mesh.

The engine's front and vocoder programs run inside shard_map over the
mesh's data axis — each device executes the complete local pipeline on
its batch slice with zero collectives (the fused Pallas kernels need no
GSPMD partitioning rule that way).  These tests pin: the ladder scales
to shard evenly, every API path matches the meshless engine bit-for-bit
(same math, just distributed), TP meshes are rejected, and the daemon +
dynamic batcher compose with the mesh.
"""

import json
import http.client

import jax
import numpy as np
import pytest

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.params import init_params
from zerovox_tpu.parallel import make_mesh
from zerovox_tpu.runtime.engine import TTSEngine

CFG = TINY_CONFIG
N_DATA = 4


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def ref_engine(params):
    return TTSEngine(params, CFG, mel_buckets=(16, 32))


@pytest.fixture(scope="module")
def dp_engine(params):
    mesh = make_mesh(data=N_DATA, model=1,
                     devices=jax.devices()[:N_DATA])
    return TTSEngine(params, CFG, mel_buckets=(16, 32), mesh=mesh)


def _inputs(rng, B):
    P = CFG.max_n_phonemes
    return (rng.integers(1, CFG.num_phonemes, size=(B, P)).astype(np.int32),
            rng.integers(0, CFG.num_puncts, size=(B, P)).astype(np.int32),
            rng.normal(scale=0.1, size=(B, CFG.d_model)).astype(np.float32))


def test_ladder_scales_to_mesh(dp_engine):
    """Every rung is a multiple of the data-axis size so each dispatch
    splits evenly across devices."""
    assert dp_engine.batch_ladder == tuple(s * N_DATA for s in (1, 2, 4, 8))


def test_tp_mesh_rejected(params):
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="pure-DP"):
        TTSEngine(params, CFG, mesh=mesh)


def test_b1_single_rtt_matches(ref_engine, dp_engine):
    """A lone request pads to one row per device and comes back identical
    to the meshless engine (same math, distributed)."""
    rng = np.random.default_rng(0)
    src, pun, style = _inputs(rng, B=1)
    ref_wavs, ref_len = ref_engine.synthesize(src, pun, style)
    wavs, mel_len = dp_engine.synthesize(src, pun, style)
    np.testing.assert_array_equal(mel_len, ref_len)
    assert len(wavs) == 1
    np.testing.assert_allclose(wavs[0], ref_wavs[0], atol=1e-6)


def test_packed_mixed_batch_matches(ref_engine, dp_engine):
    """A mixed-length B=5 batch through synthesize_packed: bucket groups
    pad to the mesh-scaled ladder and match the meshless outputs."""
    rng = np.random.default_rng(1)
    B = 5
    src, pun, style = _inputs(rng, B=B)
    nph = np.array([2, 2, CFG.max_n_phonemes, 2, CFG.max_n_phonemes],
                   np.int32)
    ref_wavs, ref_len = ref_engine.synthesize_packed(src, pun, style,
                                                     num_phonemes=nph)
    wavs, mel_len = dp_engine.synthesize_packed(src, pun, style,
                                                num_phonemes=nph)
    np.testing.assert_array_equal(mel_len, ref_len)
    for w, r in zip(wavs, ref_wavs):
        np.testing.assert_allclose(w, r, atol=1e-6)


def test_warmup_covers_mesh_ladder(dp_engine):
    """After warmup at the ladder top, a full-ladder batch mints no new
    vocoder program."""
    dp_engine.warmup(batch=dp_engine.batch_ladder[-1])
    n_before = {b: dp_engine._back_fn(b)._cache_size()
                for b in dp_engine.mel_buckets}
    rng = np.random.default_rng(2)
    src, pun, style = _inputs(rng, B=dp_engine.batch_ladder[0] + 1)
    dp_engine.synthesize_packed(src, pun, style)
    for b in dp_engine.mel_buckets:
        assert dp_engine._back_fn(b)._cache_size() == n_before[b]


def test_server_on_mesh_streams_round_robin(params):
    """Concurrent /stream sessions under --mesh d,1 spread over the data
    axis (previously all convoyed on device 0) with bit-identical audio."""
    from zerovox_tpu.runtime.server import TTSServer
    import threading

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    s = TTSServer(params, CFG, port=0, warmup=True,
                  chunk_frames=16, overlap=8, mesh=mesh)
    s.start()
    try:
        host, port = s.address
        assert s.stream.devices == list(mesh.devices.flat)
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
        results = [None] * 2
        barrier = threading.Barrier(2)

        def worker(i):
            barrier.wait()
            c = http.client.HTTPConnection(host, port, timeout=240)
            c.request("POST", "/stream", body,
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            results[i] = (r.status, r.read())

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        pcms = []
        for status, raw in results:
            assert status == 200
            pcms.append(np.frombuffer(raw[44:], dtype=np.int16))
        # same utterance through either device: bit-identical audio
        np.testing.assert_array_equal(pcms[0], pcms[1])
        # per-device dispatch actually happened: warmup + both sessions
        # replicated weights onto both mesh devices
        for d in mesh.devices.flat:
            leaf = jax.tree.leaves(s.stream.params_for(d))[0]
            assert leaf.devices() == {d}
    finally:
        s.shutdown()


def test_server_on_mesh_with_batching(params):
    """Daemon over a mesh engine + dynamic batching: concurrent requests
    coalesce into sharded dispatches and the audio matches."""
    from zerovox_tpu.runtime.server import TTSServer
    import threading

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    s = TTSServer(params, CFG, port=0, warmup=True,
                  chunk_frames=16, overlap=8,
                  batch_window_ms=50.0, mesh=mesh)
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
        results = [None] * 2
        barrier = threading.Barrier(2)

        def worker(i):
            barrier.wait()
            c = http.client.HTTPConnection(host, port, timeout=240)
            c.request("POST", "/synthesize?trim=0", body,
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            results[i] = (r.status, r.read())

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        pcms = []
        for status, raw in results:
            assert status == 200
            pcms.append(np.frombuffer(raw[44:], dtype=np.int16))
        np.testing.assert_allclose(pcms[1], pcms[0], atol=1)
        assert s.batcher.snapshot()["requests"] == 2
    finally:
        s.shutdown()
