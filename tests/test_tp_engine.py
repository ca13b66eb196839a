"""Tensor-parallel serving (runtime/tp_engine.py) on the virtual mesh.

TPServingEngine adapts parallel.make_sharded_synthesize (channel-sharded
front + time-sharded vocoder) to the daemon's engine surface: ladder-
bounded compile keys, warmup, device PCM16, the batcher's dispatch/fetch
split, and same-geometry hot reload.  These tests pin numerical parity
vs the single-device engine, the ladder padding, the server integration
(--mesh d,m with m>1), and the reload's sharding preservation.
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
from zerovox_tpu.runtime.tp_engine import TPServingEngine

CFG = TINY_CONFIG
# TP collectives (psum) reorder float sums vs the single-device program
ATOL, RTOL = 2e-4, 1e-3


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def ref_engine(params):
    return TTSEngine(params, CFG, mel_buckets=(16, 32))


@pytest.fixture(scope="module")
def tp_engine(params):
    mesh = make_mesh(data=2, model=4)            # 8 virtual CPU devices
    return TPServingEngine(params, CFG, mesh)


def _inputs(rng, B):
    P = CFG.max_n_phonemes
    return (rng.integers(1, CFG.num_phonemes, size=(B, P)).astype(np.int32),
            rng.integers(0, CFG.num_puncts, size=(B, P)).astype(np.int32),
            rng.normal(scale=0.1, size=(B, CFG.d_model)).astype(np.float32))


def test_rejects_pure_dp_mesh(params):
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="model axis"):
        TPServingEngine(params, CFG, mesh)


def test_ladder_scales_to_data_axis(tp_engine):
    assert tp_engine.batch_ladder == tuple(2 * s for s in (1, 2, 4, 8))


def test_tp_synthesize_matches_single_device(ref_engine, tp_engine):
    """B=1 (padded to one row per data shard) and a non-ladder B=3 both
    match the meshless engine within TP-collective float tolerance."""
    rng = np.random.default_rng(0)
    for B in (1, 3):
        src, pun, style = _inputs(rng, B)
        ref_wavs, ref_len = ref_engine.synthesize(src, pun, style)
        wavs, mel_len = tp_engine.synthesize(src, pun, style)
        np.testing.assert_array_equal(mel_len, ref_len)
        assert len(wavs) == B
        for w, r in zip(wavs, ref_wavs):
            assert w.shape == r.shape
            np.testing.assert_allclose(w, r, atol=ATOL, rtol=RTOL)


def test_tp_packed_alias_and_async(ref_engine, tp_engine):
    """synthesize_packed (the /batch path) and the batcher's async split
    return the same trimmed audio as the direct call."""
    rng = np.random.default_rng(1)
    src, pun, style = _inputs(rng, 2)
    direct, d_len = tp_engine.synthesize(src, pun, style)
    packed, p_len = tp_engine.synthesize_packed(src, pun, style)
    fetched, f_len = tp_engine.synthesize_async(src, pun, style)()
    np.testing.assert_array_equal(d_len, p_len)
    np.testing.assert_array_equal(d_len, f_len)
    for a, b, c in zip(direct, packed, fetched):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


def test_tp_reload_keeps_shardings_and_programs(params, tp_engine):
    """Hot reload places each new leaf with the old leaf's sharding and
    mints no new programs; swapped weights change the audio."""
    rng = np.random.default_rng(2)
    src, pun, style = _inputs(rng, 1)
    before, _ = tp_engine.synthesize(src, pun, style)
    old_shardings = jax.tree.map(lambda x: x.sharding, tp_engine.params)

    new = init_params(CFG, seed=123)
    tp_engine.reload_params(new)
    new_shardings = jax.tree.map(lambda x: x.sharding, tp_engine.params)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                     old_shardings, new_shardings))
    after, _ = tp_engine.synthesize(src, pun, style)
    assert not np.allclose(after[0][:256], before[0][:256], atol=1e-6)

    with pytest.raises(ValueError, match="geometry|tree"):
        tp_engine.reload_params(
            init_params(CFG.replace(emb_dim=CFG.emb_dim + 8), seed=0))
    # restore for other tests sharing the module fixture
    tp_engine.reload_params(params)


def test_server_on_tp_mesh(params):
    """The daemon accepts a model>1 mesh: /synthesize parity, /batch, and
    /healthz's single effective bucket."""
    from zerovox_tpu.runtime.server import TTSServer

    mesh = make_mesh(data=2, model=4)
    s = TTSServer(params, CFG, port=0, warmup=True, mesh=mesh,
                  chunk_frames=16, overlap=8)
    s.start()
    try:
        assert isinstance(s.engine, TPServingEngine)
        host, port = s.address
        rng = np.random.default_rng(3)
        src, pun, style = _inputs(rng, 1)
        body = json.dumps({"phonemes": src[0].tolist(),
                           "puncts": pun[0].tolist(),
                           "style": style[0].tolist()}).encode()
        c = http.client.HTTPConnection(host, port, timeout=240)
        c.request("POST", "/synthesize", body,
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        raw = r.read()
        assert r.status == 200 and raw[:4] == b"RIFF"
        got = np.frombuffer(raw[44:], np.int16)

        ref = TTSEngine(params, CFG, mel_buckets=(16, 32))
        ref_wavs, _ = ref.synthesize(src, pun, style, pcm16=True)
        assert got.shape == ref_wavs[0].shape
        # TP float reordering can flip the odd PCM16 LSB
        np.testing.assert_allclose(got.astype(np.int32),
                                   ref_wavs[0].astype(np.int32), atol=1)

        c = http.client.HTTPConnection(host, port, timeout=240)
        c.request("POST", "/batch",
                  json.dumps({"utterances": [json.loads(body)] * 2}).encode(),
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200
        assert len(json.loads(r.read())["wavs"]) == 2

        c = http.client.HTTPConnection(host, port, timeout=60)
        c.request("GET", "/healthz")
        h = json.loads(c.getresponse().read())
        assert h["mel_buckets"] == [CFG.max_seq_len]
    finally:
        s.shutdown()
