"""TTSClient tests: the programmatic client against a live TINY daemon.

Covers every endpoint through the client's decoding paths (complete-WAV
parse, chunked-stream reassembly with odd-byte carry, base64 batch), the
error mapping (HTTP 4xx -> TTSServerError), and the module CLI.
"""

import json

import numpy as np
import pytest

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.params import init_params
from zerovox_tpu.runtime.client import (TTSClient, TTSServerError,
                                        parse_wav_bytes, utterance)
from zerovox_tpu.runtime.server import TTSServer


@pytest.fixture(scope="module")
def server():
    params = init_params(TINY_CONFIG, seed=0)
    s = TTSServer(params, TINY_CONFIG, port=0, warmup=True,
                  chunk_frames=16, overlap=8,
                  max_body_bytes=64 << 10, max_batch=4)
    s.start()
    yield s
    s.shutdown()


@pytest.fixture(scope="module")
def client(server):
    host, port = server.address
    return TTSClient(host, port, timeout=120)


def _utt(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(1, cfg.num_phonemes + 1,
                         size=cfg.max_n_phonemes).tolist(),
            rng.normal(scale=0.05, size=cfg.d_model)
               .astype(np.float32).tolist(),
            rng.integers(0, cfg.num_puncts + 1,
                         size=cfg.max_n_phonemes).tolist())


def test_health_and_metrics(client):
    h = client.health()
    assert h["status"] == "ok"
    assert h["sampling_rate"] == TINY_CONFIG.sampling_rate
    m = client.metrics()
    assert "endpoints" in m and "uptime_s" in m


def test_synthesize_untrimmed_full_buffer(client):
    ph, st, pu = _utt(TINY_CONFIG)
    wav, sr = client.synthesize(ph, st, pu, trim=False)
    assert sr == TINY_CONFIG.sampling_rate
    assert wav.dtype == np.int16
    assert len(wav) == TINY_CONFIG.max_seq_len * TINY_CONFIG.hop_size
    assert np.any(wav != 0)


def test_stream_chunks_match_oneshot(client):
    ph, st, pu = _utt(TINY_CONFIG, seed=1)
    # tiny read_size forces many reads incl. odd-byte carries across
    # chunk boundaries — the reassembled PCM must still be exact
    chunks = list(client.stream(ph, st, pu, read_size=333))
    assert len(chunks) >= 1
    stream_pcm = np.concatenate(chunks)
    full, _ = client.synthesize(ph, st, pu, trim=False)
    n = len(stream_pcm)
    assert n > 0
    np.testing.assert_allclose(stream_pcm, full[:n], atol=1)


def test_batch_roundtrip(client):
    cfg = TINY_CONFIG
    utts = [utterance(*(_utt(cfg, seed=s))) for s in (2, 3)]
    wavs, mel_len, sr = client.batch(utts, trim=True)
    assert sr == cfg.sampling_rate
    assert len(wavs) == 2 and len(mel_len) == 2
    for w, m in zip(wavs, mel_len):
        assert w.dtype == np.int16
        assert len(w) == m * cfg.hop_size
    # batch row 0 equals the single-utterance path (same utterance)
    solo, _ = client.synthesize(*(_utt(cfg, seed=2)), trim=True)
    np.testing.assert_allclose(wavs[0], solo, atol=1)


def test_error_mapping(client):
    with pytest.raises(TTSServerError) as ei:
        client.synthesize([1, 2, 3], [0.0])        # style dim mismatch
    assert ei.value.status == 400
    assert "style" in ei.value.message
    # oversized utterance -> 400 from the daemon's explicit length check
    with pytest.raises(TTSServerError) as ei:
        client.synthesize([1] * (TINY_CONFIG.max_n_phonemes + 1),
                          [0.0] * TINY_CONFIG.d_model)
    assert ei.value.status == 400


def test_parse_wav_bytes_rejects_garbage():
    with pytest.raises(ValueError):
        parse_wav_bytes(b"not a wav" * 10)


class _SheddingStub:
    """Minimal HTTP stub that answers 503 + Retry-After n times, then 200.

    Exercises the client's admission-control retry (server.py returns 503
    when in-flight requests exceed --max-concurrent) without having to
    race a real daemon into overload.
    """

    def __init__(self, shed_first_n: int):
        import http.server
        import threading

        stub = self

        class H(http.server.BaseHTTPRequestHandler):
            def _respond(self):
                stub.hits += 1
                if stub.hits <= shed_first_n:
                    body = b'{"error": "server overloaded"}'
                    self.send_response(503)
                    self.send_header("Retry-After", "0.05")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path.startswith("/stream"):
                    import struct
                    pcm = np.arange(8, dtype="<i2").tobytes()
                    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm))
                           + b"WAVEfmt " + struct.pack(
                               "<IHHIIHH", 16, 1, 1, 22050, 44100, 2, 16)
                           + b"data" + struct.pack("<I", len(pcm)))
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length",
                                     str(len(hdr) + len(pcm)))
                    self.end_headers()
                    self.wfile.write(hdr + pcm)
                    return
                body = json.dumps({"status": "ok"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            do_GET = do_POST = _respond

            def log_message(self, *a):
                pass

        self.hits = 0
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_client_retries_503_until_success():
    stub = _SheddingStub(shed_first_n=2)
    try:
        c = TTSClient("127.0.0.1", stub.port, timeout=10, retries_503=3)
        assert c.health()["status"] == "ok"
        assert stub.hits == 3          # 2 sheds + 1 success
    finally:
        stub.close()


def test_client_503_exhausted_raises():
    stub = _SheddingStub(shed_first_n=100)
    try:
        c = TTSClient("127.0.0.1", stub.port, timeout=10, retries_503=1)
        with pytest.raises(TTSServerError) as ei:
            c.health()
        assert ei.value.status == 503
        assert stub.hits == 2          # first try + 1 retry
    finally:
        stub.close()


def test_client_stream_retries_503():
    stub = _SheddingStub(shed_first_n=1)
    try:
        c = TTSClient("127.0.0.1", stub.port, timeout=10, retries_503=2)
        pcm = np.concatenate(list(c.stream([1], [0.0])))
        np.testing.assert_array_equal(pcm, np.arange(8, dtype=np.int16))
        assert stub.hits == 2          # 1 shed + 1 success
    finally:
        stub.close()


def test_client_retries_disabled():
    stub = _SheddingStub(shed_first_n=1)
    try:
        c = TTSClient("127.0.0.1", stub.port, timeout=10, retries_503=0)
        with pytest.raises(TTSServerError) as ei:
            c.health()
        assert ei.value.status == 503
        assert stub.hits == 1
    finally:
        stub.close()


def test_module_cli_oneshot_and_stream(client, server, tmp_path):
    from zerovox_tpu.io.wav import read_wav
    from zerovox_tpu.runtime.client import _main

    ph, st, pu = _utt(TINY_CONFIG, seed=4)
    utt_path = tmp_path / "utt.json"
    utt_path.write_text(json.dumps(
        {"phonemes": ph, "style": st, "puncts": pu}))
    host, port = server.address

    out = tmp_path / "one.wav"
    assert _main(["--host", host, "--port", str(port), "--json",
                  str(utt_path), "--out", str(out), "--no-trim"]) == 0
    wav, sr = read_wav(str(out))
    assert sr == TINY_CONFIG.sampling_rate
    assert len(wav) == TINY_CONFIG.max_seq_len * TINY_CONFIG.hop_size

    out2 = tmp_path / "stream.wav"
    assert _main(["--host", host, "--port", str(port), "--json",
                  str(utt_path), "--out", str(out2), "--stream"]) == 0
    wav2, _ = read_wav(str(out2))
    n = len(wav2)
    assert n > 0
    np.testing.assert_allclose(wav2, wav[:n], atol=2.0 / 32767.0)
