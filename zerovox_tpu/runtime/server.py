"""HTTP serving daemon: a warm engine answering synthesis requests.

The reference is a single-shot binary whose `main` hardcodes one utterance
and one output file (/root/reference/src/zerovox.cpp:396-406); keeping a
compiled model resident and serving many requests has no reference
counterpart.  This daemon is deliberately stdlib-only (http.server): a
ThreadingHTTPServer sharing one `TTSEngine` (its compile cache is
lock-guarded; see tests/test_runtime.py concurrent-request test) and one
`StreamingSynthesizer` (stream state is generator-local and its program
cache is internally locked, so concurrent /stream requests interleave
freely — their per-chunk host round trips overlap instead of convoying).

Endpoints (all JSON bodies use the CLI's utterance schema —
{"phonemes": [...], "style": [...], "puncts": optional}):

  GET  /healthz      -> {"status": "ok", "sampling_rate": ..., ...}
  GET  /metrics      -> per-endpoint request counts, error counts, and
                        p50/p95/max latency over the last 512 requests
  POST /synthesize   -> complete WAV (query: ?trim=0 keeps the padded
                        buffer, the reference's behavior); with
                        batch_window_ms > 0, concurrent requests coalesce
                        into packed device dispatches (runtime/batcher.py);
                        ?split=1 accepts utterances of ANY length,
                        splitting at punctuation into one packed batch
                        (runtime/longform.py — the reference truncates at
                        120 phonemes instead)
  POST /batch        -> {"utterances": [utt, ...]} -> JSON array of
                        base64 WAVs via the bucket-packed engine path
                        (one vocoder dispatch per mel bucket group,
                        ladder-bounded compile keys)
  POST /stream       -> chunked WAV: the 44-byte header (streaming-size
                        convention) followed by PCM16 the moment each
                        vocoder chunk lands — time-to-first-byte is the
                        engine's TTFA, not the utterance length
  POST /reload       -> {"model": path}: hot-swap weights from a new
                        same-geometry GGUF; compiled programs stay valid
                        so no recompile/restart (opt-in: allow_reload /
                        --allow-reload; 403 otherwise, 409 on geometry
                        change)

/synthesize and /stream also accept Content-Type:
application/octet-stream with the raw-binary utterance body
(utterance_to_binary: b"ZVB1" + uint32 n + int32 phonemes/puncts +
float32 style) — the latency fast path, parsed with three zero-copy
frombuffer views instead of a JSON decode of ~650 numbers.
"""

from __future__ import annotations

import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence, Tuple
from urllib.parse import urlparse, parse_qs

import numpy as np

from ..config import ZeroVoxConfig
from ..io.wav import float_to_pcm16, _wav_header


class RequestTooLarge(ValueError):
    """Request body exceeds the server's cap (HTTP 413)."""


class Metrics:
    """Per-endpoint request counters + latency quantiles (GET /metrics).

    The reference's observability is printf lines (SURVEY §5); a resident
    daemon needs machine-readable counters.  Latencies keep a bounded ring
    (last `window` requests per endpoint) and the endpoint set itself is
    bounded by the caller (do_POST buckets unknown paths under "other"),
    so memory stays O(1) under load — including attacker-chosen URLs.
    """

    def __init__(self, window: int = 512):
        self._lock = threading.Lock()
        self._window = window
        self._t0 = time.time()
        self._ep: dict = {}

    def record(self, endpoint: str, status: int, seconds: float):
        with self._lock:
            ep = self._ep.setdefault(endpoint, {
                "count": 0, "errors": 0, "lat": [], "i": 0})
            ep["count"] += 1
            if status >= 400:
                ep["errors"] += 1
            if len(ep["lat"]) < self._window:
                ep["lat"].append(seconds)
            else:
                ep["lat"][ep["i"] % self._window] = seconds
            ep["i"] += 1

    def snapshot(self) -> dict:
        with self._lock:
            out = {"uptime_s": round(time.time() - self._t0, 3),
                   "endpoints": {}}
            for name, ep in self._ep.items():
                lat = sorted(ep["lat"])
                q = (lambda p: round(
                    1e3 * lat[min(len(lat) - 1, int(p * len(lat)))], 3)
                    ) if lat else (lambda p: None)
                out["endpoints"][name] = {
                    "count": ep["count"], "errors": ep["errors"],
                    "p50_ms": q(0.50), "p95_ms": q(0.95), "max_ms": q(1.0),
                }
            return out


def prometheus_text(snap: dict) -> str:
    """Render a /metrics snapshot in the Prometheus exposition format.

    The JSON snapshot stays the primary schema (tests, bench_daemon);
    this is the same data re-keyed for scrape-based monitoring
    (GET /metrics?format=prometheus), so a production deployment plugs
    into a standard Prometheus/Grafana stack without an adapter.
    Latency quantiles are converted ms -> seconds per Prometheus
    convention; they are windowed quantiles (last 512 requests), exposed
    as gauges rather than a native summary.
    """
    lines = [
        "# HELP zerovox_uptime_seconds Daemon uptime.",
        "# TYPE zerovox_uptime_seconds gauge",
        f"zerovox_uptime_seconds {snap['uptime_s']}",
        "# TYPE zerovox_requests_total counter",
        "# TYPE zerovox_request_errors_total counter",
        "# TYPE zerovox_request_latency_seconds gauge",
    ]
    for name, ep in sorted(snap.get("endpoints", {}).items()):
        lab = f'{{endpoint="{name}"}}'
        lines.append(f"zerovox_requests_total{lab} {ep['count']}")
        lines.append(f"zerovox_request_errors_total{lab} {ep['errors']}")
        for q, key in (("0.5", "p50_ms"), ("0.95", "p95_ms"),
                       ("1.0", "max_ms")):
            if ep.get(key) is not None:
                lines.append(
                    f'zerovox_request_latency_seconds{{endpoint="{name}",'
                    f'quantile="{q}"}} {ep[key] / 1e3:.6f}')
    for d in snap.get("device", {}).get("devices", []):
        lab = f'{{device="{d["id"]}",platform="{d["platform"]}"}}'
        # info-style inventory line: always present even when the backend
        # reports no memory stats (CPU, tunnel), so a dashboard can count
        # devices and alert on the gauge disappearing
        lines.append(f"zerovox_device_up{lab} 1")
        for key in ("bytes_in_use", "bytes_limit"):
            if key in d:
                lines.append(f"zerovox_device_{key}{lab} {d[key]}")
    for key, val in sorted(snap.get("batcher", {}).items()):
        if isinstance(val, (int, float)):
            lines.append(f"zerovox_batcher_{key} {val}")
    return "\n".join(lines) + "\n"


def parse_utterance_arrays(d: dict, cfg: ZeroVoxConfig
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Validate the utterance JSON schema into raw (ph, pu, style) arrays
    of ANY length (callers enforce or split around max_n_phonemes)."""
    for key in ("phonemes", "style"):
        if key not in d:
            raise ValueError(f"missing required key {key!r} "
                             "(need phonemes, style; optional puncts)")
    try:
        ph = np.asarray(d["phonemes"], dtype=np.int32)
        pu = np.asarray(d.get("puncts", np.zeros_like(ph)), dtype=np.int32)
        style = np.asarray(d["style"], dtype=np.float32).reshape(1, -1)
    except (TypeError, ValueError, OverflowError) as e:
        raise ValueError(f"malformed utterance arrays: {e}")
    if ph.ndim != 1 or pu.shape != ph.shape:
        raise ValueError("phonemes/puncts must be equal-length 1-D lists")
    if style.shape[1] != cfg.d_model:
        raise ValueError(f"style embedding has {style.shape[1]} dims, "
                         f"model wants {cfg.d_model}")
    return ph, pu, style


BINARY_MAGIC = b"ZVB1"


def utterance_to_binary(phonemes, style, puncts=None) -> bytes:
    """Pack one utterance as the daemon's raw-binary request body:
    b"ZVB1" + uint32 n + n int32 phonemes + n int32 puncts + d_model
    float32 style, all little-endian.  The opt-in fast path for latency
    clients: parsing it is three zero-copy np.frombuffer views instead of
    a json.loads over ~650 Python numbers (VERDICT r4 #6)."""
    ph = np.ascontiguousarray(phonemes, dtype="<i4").reshape(-1)
    pu = (np.zeros_like(ph) if puncts is None
          else np.ascontiguousarray(puncts, dtype="<i4").reshape(-1))
    if pu.shape != ph.shape:
        raise ValueError("phonemes/puncts must be equal length")
    st = np.ascontiguousarray(style, dtype="<f4").reshape(-1)
    return (BINARY_MAGIC + np.uint32(len(ph)).tobytes()
            + ph.tobytes() + pu.tobytes() + st.tobytes())


def utterance_from_binary(buf: bytes, cfg: ZeroVoxConfig
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                     np.ndarray]:
    """Parse the raw-binary utterance body (see utterance_to_binary) into
    padded (src, pun, style, n) — the binary twin of utterance_from_dict,
    same validation semantics (ValueError -> HTTP 400)."""
    P = cfg.max_n_phonemes
    if len(buf) < 8 or buf[:4] != BINARY_MAGIC:
        raise ValueError("binary utterance: bad magic (want b'ZVB1')")
    n = int(np.frombuffer(buf, "<u4", 1, 4)[0])
    if n > P:
        raise ValueError(f"{n} phonemes exceeds the model's "
                         f"max_n_phonemes={P}; split the utterance")
    need = 8 + 8 * n + 4 * cfg.d_model
    if len(buf) != need:
        raise ValueError(f"binary utterance: body is {len(buf)} bytes, "
                         f"expected {need} for n={n}, "
                         f"d_model={cfg.d_model}")
    ph = np.frombuffer(buf, "<i4", n, 8)
    pu = np.frombuffer(buf, "<i4", n, 8 + 4 * n)
    style = np.frombuffer(buf, "<f4", cfg.d_model,
                          8 + 8 * n).reshape(1, -1).copy()
    src = np.zeros((1, P), np.int32)
    pun = np.zeros((1, P), np.int32)
    src[0, :n] = ph
    pun[0, :n] = pu
    return src, pun, style, np.asarray([n], np.int32)


def utterance_from_dict(d: dict, cfg: ZeroVoxConfig
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """Parse the utterance JSON schema into padded (src, pun, style, n).

    Raises ValueError on schema violations (the CLI wraps this into
    SystemExit, the server into HTTP 400).
    """
    P = cfg.max_n_phonemes
    ph, pu, style = parse_utterance_arrays(d, cfg)
    if len(ph) > P:
        # silently truncating would return shortened audio with a 200 (or,
        # through the CLI, a silently shortened WAV); an explicit error
        # tells the caller to split the utterance
        raise ValueError(f"{len(ph)} phonemes exceeds the model's "
                         f"max_n_phonemes={P}; split the utterance")
    n = len(ph)
    src = np.zeros((1, P), np.int32)
    pun = np.zeros((1, P), np.int32)
    src[0, :n] = ph[:n]
    pun[0, :n] = pu[:n]
    return src, pun, style, np.asarray([n], np.int32)


def _device_stats() -> dict:
    """Device inventory + HBM usage for /metrics (an operator watching a
    resident daemon needs to see memory pressure before an OOM, not
    after).  memory_stats() is best-effort: some backends (CPU, tunnel)
    return None or omit keys."""
    import jax
    out = []
    try:
        # backend build identity: a rotated backend build legitimately
        # re-keys every compiled program (the persistent compile cache
        # hashes platform_version — ARCHITECTURE §13 "relocatable"), so
        # an operator watching warmup times needs to see it change
        version = ""
        try:
            version = jax.local_devices()[0].client.platform_version
        except (IndexError, AttributeError, RuntimeError):
            pass
        for d in jax.local_devices():
            row = {"id": d.id, "kind": d.device_kind,
                   "platform": d.platform}
            try:
                ms = d.memory_stats() or {}
                if "bytes_in_use" in ms:
                    row["bytes_in_use"] = int(ms["bytes_in_use"])
                if "bytes_limit" in ms:
                    row["bytes_limit"] = int(ms["bytes_limit"])
            except (RuntimeError, NotImplementedError, AttributeError):
                pass
            out.append(row)
    except RuntimeError as e:           # backend gone mid-call
        return {"error": str(e)[:200]}
    return {"devices": out, "platform_version": version}


class TTSServer:
    """Thread-per-connection HTTP server over a warm TTSEngine."""

    def __init__(self, params, cfg: ZeroVoxConfig,
                 host: str = "127.0.0.1", port: int = 8765,
                 precision: str = "float32",
                 mel_buckets: Sequence[int] = (256, 512, 1024),
                 chunk_frames: int = 64, overlap: int = 16,
                 warmup: bool = True,
                 max_body_bytes: int = 4 << 20, max_batch: int = 64,
                 batch_window_ms: float = 0.0, mesh=None,
                 allow_reload: bool = False, max_concurrent: int = 64):
        from .engine import TTSEngine
        from ..models.streaming import StreamingSynthesizer

        # input caps: a single oversized request must not exhaust host
        # memory or mint unbounded device work on a production server
        self.max_body_bytes = int(max_body_bytes)
        self.max_batch = int(max_batch)
        # Bind the listening socket BEFORE any device work: a port
        # conflict must surface now, not after the minutes-long tunnel
        # warmup — and a bound-but-not-yet-serving socket lets an
        # orchestrator's TCP liveness probe distinguish "warming" from
        # "dead".  The real handler class is attached at the end of
        # __init__; nothing is accepted until serve_forever().
        self._httpd = ThreadingHTTPServer((host, port), None)
        self._serving = threading.Event()
        # /reload loads a checkpoint PATH from the request body — opt-in
        # only (CLI --allow-reload), for deployments where the daemon is
        # behind a trusted admin plane
        self.allow_reload = bool(allow_reload)
        self._reload_lock = threading.Lock()
        # admission control: at most max_concurrent synthesis/stream
        # requests in flight; excess answers 503 + Retry-After (load is
        # shed fast instead of piling threads on a saturated device)
        self._admission = threading.Semaphore(max(1, int(max_concurrent)))
        self.metrics = Metrics()
        # mesh: multi-chip serving.  Pure-DP (model axis == 1): the engine
        # shard_maps its front/vocoder programs over the data axis
        # (engine.py) — pairs naturally with dynamic batching, which fills
        # the wider ladder.  Model axis > 1: tensor-parallel serving via
        # TPServingEngine (tp_engine.py) — channel-sharded front +
        # time-sharded vocoder, same ladder/warmup/PCM16/reload surface.
        try:
            n_model = 1
            if mesh is not None:
                from ..parallel.mesh import MODEL_AXIS
                n_model = mesh.shape.get(MODEL_AXIS, 1)
            if n_model > 1:
                from .tp_engine import TPServingEngine
                self.engine = TPServingEngine(params, cfg, mesh,
                                              precision=precision)
            else:
                self.engine = TTSEngine(params, cfg,
                                        mel_buckets=mel_buckets,
                                        precision=precision, mesh=mesh)
            # the engine may have cast params/cfg for bf16 serving; the
            # streaming synthesizer must share that state.  Under a DP
            # mesh, concurrent /stream sessions round-robin over the data
            # axis (each session single-device; VERDICT r4 weak #3 had
            # them all convoying on device 0); under TP (model>1) the
            # per-chunk programs stay single-device — chunk windows are
            # too short to win from channel sharding.
            stream_devices = None
            if mesh is not None and n_model == 1:
                stream_devices = list(mesh.devices.flat)
            self.stream = StreamingSynthesizer(
                self.engine.host_params, self.engine.cfg,
                chunk_frames=chunk_frames, overlap=overlap,
                pcm16=True,  # chunks arrive device-quantised (half bytes)
                devices=stream_devices)
            if warmup:
                # /synthesize serves the device-quantised int16 variants:
                # the PCM16 fetch halves the host-transfer bytes, which
                # dominate one-shot latency (engine._back_fn docstring).
                # Warm at the ladder TOP so every front + vocoder program
                # any /batch mix can hit is compiled before the first
                # request (ADVICE r3: warming only batch=1 left the first
                # multi-utterance request paying the multi-minute tunnel
                # first-compile the ladder exists to avoid).
                self.engine.warmup(batch=self.engine.batch_ladder[-1],
                                   pcm16=True)
                self.stream.warmup()

            # dynamic batching (off by default): concurrent /synthesize
            # requests arriving within the window share one packed
            # dispatch — linear batch scaling makes that ~Bx per-chip
            # throughput under load (runtime/batcher.py)
            self.batcher = None
            if batch_window_ms > 0:
                from .batcher import DynamicBatcher
                self.batcher = DynamicBatcher(self.engine,
                                              window_ms=batch_window_ms)
        except BaseException:
            # construction/warmup failed: release the early-bound port
            # deterministically (no dangling listener until GC)
            self._httpd.server_close()
            raise

        server = self

        class Handler(BaseHTTPRequestHandler):
            # chunked transfer framing only exists in HTTP/1.1 — the 1.0
            # default would make version-honoring clients read the raw
            # chunk-size lines into the audio.  Every response therefore
            # carries Content-Length or Transfer-Encoding (1.1 keep-alive).
            protocol_version = "HTTP/1.1"

            def setup(self):
                super().setup()
                # a stalled client must time out rather than pin its
                # handler thread (and, worse, anything it holds) forever
                self.connection.settimeout(300)

            # quiet per-request stderr lines; errors still surface as codes
            def log_message(self, *a):
                pass

            def _json(self, code: int, obj: dict):
                self._status = code
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _read_body(self) -> bytes:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    raise ValueError("empty request body")
                if length > server.max_body_bytes:
                    raise RequestTooLarge(
                        f"request body {length} bytes exceeds the "
                        f"{server.max_body_bytes}-byte cap")
                return self.rfile.read(length)

            def _read_json(self):
                return json.loads(self._read_body())

            def _is_binary(self) -> bool:
                ctype = self.headers.get("Content-Type", "")
                return ctype.split(";")[0].strip() == \
                    "application/octet-stream"

            def _read_utterance(self):
                # Content-Type: application/octet-stream selects the
                # raw-binary utterance body (utterance_from_binary) —
                # three zero-copy frombuffer views instead of a JSON
                # parse of ~650 numbers; same validation, same 400s
                if self._is_binary():
                    return utterance_from_binary(self._read_body(),
                                                 server.engine.cfg)
                return utterance_from_dict(self._read_json(),
                                           server.engine.cfg)

            def do_GET(self):
                url = urlparse(self.path)
                path = url.path
                if path == "/metrics":
                    snap = server.metrics.snapshot()
                    if server.batcher is not None:
                        snap["batcher"] = server.batcher.snapshot()
                    snap["device"] = _device_stats()
                    fmt = parse_qs(url.query).get("format", [""])[0]
                    if fmt == "prometheus":
                        body = prometheus_text(snap).encode()
                        self._status = 200
                        self.send_response(200)
                        self.send_header(
                            "Content-Type",
                            "text/plain; version=0.0.4; charset=utf-8")
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                        return
                    return self._json(200, snap)
                if path != "/healthz":
                    return self._json(404, {"error": "unknown endpoint"})
                cfg = server.engine.cfg
                self._json(200, {
                    "status": "ok",
                    "sampling_rate": cfg.sampling_rate,
                    "max_seq_len": cfg.max_seq_len,
                    "precision": cfg.compute_dtype,
                    "mel_buckets": list(server.engine.mel_buckets),
                    "platform_version":
                        _device_stats().get("platform_version", ""),
                })

            # the metrics key set must be bounded: recording raw request
            # paths would grow one ring buffer per attacker-chosen URL
            KNOWN_ENDPOINTS = frozenset(
                ("/synthesize", "/batch", "/stream", "/reload"))

            def do_POST(self):
                url = urlparse(self.path)
                endpoint = (url.path if url.path in self.KNOWN_ENDPOINTS
                            else "other")
                t0 = time.perf_counter()
                try:
                    return self._route(url)
                finally:
                    server.metrics.record(endpoint, self._status,
                                          time.perf_counter() - t0)

            def _route(self, url):
                self._body_started = False
                self._status = 200
                try:
                    if url.path in ("/synthesize", "/batch", "/stream"):
                        # admission control: ThreadingHTTPServer spawns a
                        # thread per connection, so without a cap an
                        # overload storm piles unbounded threads (and
                        # batcher queue) onto a device that can't keep
                        # up.  Shed load FAST with 503 + Retry-After
                        # instead — the client's retry lands when slots
                        # free up.
                        if not server._admission.acquire(blocking=False):
                            self.send_response(503)
                            self.send_header("Retry-After", "1")
                            self.send_header("Content-Length", "0")
                            self.end_headers()
                            self._status = 503
                            return
                        try:
                            if url.path == "/synthesize":
                                return self._synthesize(url)
                            if url.path == "/batch":
                                return self._batch(url)
                            return self._stream(url)
                        finally:
                            server._admission.release()
                    if url.path == "/reload":
                        return self._reload(url)
                    return self._json(404, {"error": "unknown endpoint"})
                except (ValueError, json.JSONDecodeError) as e:
                    if self._body_started:
                        # headers (and possibly chunks) are on the wire: a
                        # JSON error response here would be parsed as
                        # chunk framing — drop the connection instead so
                        # the client sees a truncated (invalid) stream
                        self._status = 500
                        self.close_connection = True
                        return
                    code = 413 if isinstance(e, RequestTooLarge) else 400
                    if code == 413:
                        # the oversized body was never read; drop the
                        # connection after responding rather than parsing
                        # the leftover bytes as the next request
                        self.close_connection = True
                    try:
                        return self._json(code, {"error": str(e)})
                    except OSError:
                        # client already gone before reading its error
                        self.close_connection = True
                        return
                except OSError:
                    # client went away mid-response (BrokenPipe on a /stream
                    # chunk write, reset, timeout): close quietly instead of
                    # killing the handler thread with a traceback
                    self._status = 499          # nginx's client-closed code
                    self.close_connection = True
                    return
                except Exception as e:          # noqa: BLE001
                    # anything unanticipated (e.g. OverflowError from a
                    # pathological numeric payload, which numpy raises
                    # OUTSIDE the ValueError family) must still produce an
                    # HTTP error and an accurate metrics row — not a dead
                    # handler thread recorded as a 200.  Detail goes to the
                    # server log only: exception text can carry paths/
                    # shapes/internals a network client has no business
                    # seeing
                    import sys
                    import traceback
                    print(f"server: 500 on {url.path}: "
                          f"{type(e).__name__}: {e}", file=sys.stderr)
                    traceback.print_exc()
                    self._status = 500
                    if self._body_started:
                        self.close_connection = True
                        return
                    try:
                        return self._json(500, {"error": "internal error"})
                    except OSError:
                        self.close_connection = True
                        return

            def _synthesize(self, url):
                q = parse_qs(url.query)
                if q.get("split", ["0"])[0] != "0":
                    # long-form mode: utterances of ANY length split at
                    # punctuation boundaries into one packed dispatch
                    # (runtime/longform.py); split implies trim — the
                    # windows' padded tails cannot meaningfully concat
                    from .longform import synthesize_long
                    ph, pu, style = parse_utterance_arrays(
                        self._read_json(), server.engine.cfg)
                    if len(ph) == 0:
                        raise ValueError("empty phoneme sequence")
                    # each split window is one utterance of device work:
                    # bound it by the same cap as /batch, or one request
                    # could mint minutes of dispatches inside its one
                    # admission slot
                    wav, _ = synthesize_long(server.engine, ph, pu, style,
                                             pcm16=True,
                                             max_windows=server.max_batch)
                else:
                    src, pun, style, n = self._read_utterance()
                    trim = q.get("trim", ["1"])[0] != "0"
                    if server.batcher is not None:
                        wav, _ = server.batcher.synthesize(
                            src, pun, style, n, trim=trim, pcm16=True)
                    else:
                        wavs, _ = server.engine.synthesize(
                            src, pun, style, n, trim=trim, pcm16=True)
                        wav = wavs[0]
                pcm = wav.tobytes()
                sr = server.engine.cfg.sampling_rate
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(44 + len(pcm)))
                self.end_headers()
                self.wfile.write(_wav_header(sr, len(pcm)))
                self.wfile.write(pcm)

            def _reload(self, url):
                """Hot-swap weights from a new GGUF: compiled programs
                stay valid (engine.reload_params), so a model update
                costs one weight transfer instead of a daemon restart.
                The checkpoint's geometry must match; changes that need
                new programs go through a restart."""
                if not server.allow_reload:
                    return self._json(
                        403, {"error": "reload disabled; start the "
                                       "daemon with --allow-reload"})
                body = self._read_json()
                path = body.get("model")
                if not isinstance(path, str) or not path:
                    raise ValueError("need {'model': '/path/to.gguf'}")
                from ..params import load_params
                try:
                    new_cfg, new_params = load_params(path)
                except (OSError, EOFError, KeyError) as e:
                    return self._json(400, {
                        "error": f"cannot load {path!r}: {e}"})
                cfg = server.engine.cfg
                for f in ("max_seq_len", "max_n_phonemes", "d_model",
                          "num_mels", "sampling_rate", "hop_size"):
                    if getattr(new_cfg, f) != getattr(cfg, f):
                        return self._json(409, {
                            "error": f"geometry changed ({f}: "
                                     f"{getattr(new_cfg, f)} vs "
                                     f"{getattr(cfg, f)}); restart the "
                                     "daemon for geometry changes"})
                with server._reload_lock:
                    try:
                        server.engine.reload_params(new_params)
                    except ValueError as e:
                        return self._json(409, {"error": str(e)})
                    # the streaming synthesizer shares the engine's cast
                    # host tree; in-flight streams finish mixed (old
                    # prefix mel + new vocoder weights) — valid audio,
                    # converges from the next stream on.  set_params also
                    # drops the per-device replicas under --mesh
                    server.stream.set_params(server.engine.host_params)
                self._json(200, {"status": "reloaded", "model": path})

            def _batch(self, url):
                utts = self._read_json().get("utterances")
                if not isinstance(utts, list) or not utts:
                    raise ValueError("need a non-empty 'utterances' list")
                if len(utts) > server.max_batch:
                    raise ValueError(
                        f"{len(utts)} utterances exceeds the per-request "
                        f"cap of {server.max_batch}")
                cfg = server.engine.cfg
                parsed = [utterance_from_dict(u, cfg) for u in utts]
                src = np.concatenate([p[0] for p in parsed])
                pun = np.concatenate([p[1] for p in parsed])
                sty = np.concatenate([p[2] for p in parsed])
                n = np.concatenate([p[3] for p in parsed])
                trim = parse_qs(url.query).get("trim", ["1"])[0] != "0"
                wavs, mel_len = server.engine.synthesize_packed(
                    src, pun, sty, n, trim=trim, pcm16=True)
                sr = cfg.sampling_rate
                out = [base64.b64encode(
                           _wav_header(sr, 2 * len(w))
                           + w.tobytes()).decode()
                       for w in wavs]
                self._json(200, {"wavs": out,
                                 "mel_len": [int(m) for m in mel_len]})

            def _stream(self, url):
                q = parse_qs(url.query)
                if q.get("split", ["0"])[0] != "0":
                    # long-form streaming: each punctuation-split window
                    # streams in turn into the same chunked response —
                    # arbitrary-length text at the same TTFA (streams are
                    # mel_len-trimmed, so windows concatenate seamlessly)
                    from .longform import split_utterance
                    cfg = server.engine.cfg
                    ph, pu, style = parse_utterance_arrays(
                        self._read_json(), cfg)
                    if len(ph) == 0:
                        raise ValueError("empty phoneme sequence")
                    srcs, puns, lens = split_utterance(
                        ph, pu, cfg.max_n_phonemes)
                    if len(lens) > server.max_batch:   # same cap as /batch
                        raise ValueError(
                            f"utterance splits into {len(lens)} windows, "
                            f"exceeding the cap of {server.max_batch}; "
                            "send it in several requests")
                    windows = [(srcs[i:i + 1], puns[i:i + 1], style,
                                lens[i:i + 1]) for i in range(len(lens))]
                else:
                    windows = [self._read_utterance()]
                sr = server.engine.cfg.sampling_rate
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                self._body_started = True

                def chunk(b: bytes):
                    self.wfile.write(f"{len(b):X}\r\n".encode())
                    self.wfile.write(b)
                    self.wfile.write(b"\r\n")
                    self.wfile.flush()

                # streaming-WAV convention: unknown-length sizes; players
                # read until the stream ends
                chunk(_wav_header(sr, 0xFFFFFFFF - 44))
                # no server-side lock: stream state is generator-local
                # and the synthesizer's program cache locks internally,
                # so concurrent /stream handlers overlap their per-chunk
                # device round trips (on a ~30 ms-RTT tunnel a global
                # lock would serialize ALL streams to one chunk per RTT)
                for src, pun, style, n in windows:
                    for piece in server.stream.stream(src, pun, style, n):
                        piece = np.asarray(piece)
                        if piece.dtype != np.int16:  # pcm16=False synths
                            piece = float_to_pcm16(piece)
                        chunk(piece.tobytes())
                self.wfile.write(b"0\r\n\r\n")
                self.wfile.flush()

        # socket was bound (and the port claimed) at the top of __init__;
        # attaching the handler class arms it for serve_forever()
        self._httpd.RequestHandlerClass = Handler
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self._httpd.server_address[:2]

    def serve_forever(self):
        self._serving.set()
        self._httpd.serve_forever()

    def start(self):
        # mark serving BEFORE the thread launches: a shutdown() racing the
        # thread's entry into serve_forever() must wait for it (BaseServer
        # handles the set-flag-first ordering), not skip the wait
        self._serving.set()
        """Serve on a daemon thread (tests / embedding)."""
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)
        self._thread.start()

    def shutdown(self):
        # BaseServer.shutdown() waits on an event that only
        # serve_forever() ever sets — calling it on a server that never
        # started would block forever.  A constructed-but-never-served
        # TTSServer (an embedder erroring out between __init__ and
        # start()) just closes its socket.
        if self._serving.is_set():
            self._httpd.shutdown()
        self._httpd.server_close()
        if self.batcher is not None:
            self.batcher.stop()
        if self._thread is not None:
            self._thread.join(timeout=5)
