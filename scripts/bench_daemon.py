"""Serving-daemon latency benchmark: /synthesize p50 and /stream TTFA p50
measured end-to-end over a live socket against a warm TTSServer.

The r3 daemon numbers (/synthesize p50 82.8 ms pre-PCM16, /stream TTFB
39.9 ms) were measured ad hoc; this script makes the measurement one
command so every round can re-anchor docs/ARCHITECTURE.md §13 (and so the
post-PCM16 /synthesize projection gets replaced by a measurement, VERDICT
r3 weak #3).

Prints ONE JSON line, e.g.:
  {"synthesize_p50_ms": ..., "synthesize_min_ms": ...,
   "stream_ttfa_p50_ms": ..., "stream_header_ttfb_p50_ms": ...,
   "stream_full_p50_ms": ..., "batch4_p50_ms": ..., "reps": N}

Usage:  python scripts/bench_daemon.py [--model m.gguf] [--reps 15]
        [--f32] [--port 0]
Without --model, a production-geometry synthetic model is used with the
duration-predictor bias shifted (+1.5) so streamed utterances have real
length (~4.5 frames/phoneme) instead of the zero durations random weights
predict.
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _utterance(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "phonemes": rng.integers(1, cfg.num_phonemes,
                                 size=cfg.max_n_phonemes).tolist(),
        "puncts": rng.integers(0, cfg.num_puncts,
                               size=cfg.max_n_phonemes).tolist(),
        "style": rng.normal(scale=0.1, size=cfg.d_model)
                    .astype(np.float32).tolist(),
    }


def _p50(xs):
    return float(np.median(xs) * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="GGUF checkpoint")
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--no-batch", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="TINY geometry (CPU smoke run of this script)")
    ap.add_argument("--load", type=int, default=0, metavar="N",
                    help="also measure sustained throughput with N "
                         "concurrent clients (req/s + p50 under load)")
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="enable the daemon's dynamic batching (A/B the "
                         "--load throughput against 0)")
    ap.add_argument("--stream-load", type=int, default=0, metavar="N",
                    help="also measure N concurrent /stream clients "
                         "(TTFA p50 under load + aggregate audio-s/s; "
                         "streams interleave without a server lock)")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1 (medians of zero measurements)")

    import os
    try:
        # shared with bench.py: only the first battery leg pays the
        # multi-minute tunnel compiles (jax swallows cache errors)
        from zerovox_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(os.environ.get(
            "ZV_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".cache", "xla-cache")))
    except OSError as e:
        print(f"bench_daemon: compile cache unavailable ({e})",
              file=sys.stderr)

    if args.tiny:
        # CPU smoke mode must not depend on the TPU tunnel being up
        # (the axon plugin overrides JAX_PLATFORMS; use the config API)
        import jax
        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.config import TINY_CONFIG, ZeroVoxConfig
    from zerovox_tpu.params import init_params, load_params
    from zerovox_tpu.runtime.server import TTSServer

    if args.model:
        cfg, params = load_params(args.model)
    else:
        cfg = TINY_CONFIG if args.tiny else ZeroVoxConfig()
        params = init_params(cfg, seed=0)
        # non-trivial durations (~exp(1.5)-1 ≈ 3.5 frames/phoneme) so the
        # streamed audio has production-like length
        dp = dict(params["encoder"]["duration_predictor"])
        dp["lin_b"] = dp["lin_b"] + 1.5
        enc = dict(params["encoder"])
        enc["duration_predictor"] = dp
        params = dict(params)
        params["encoder"] = enc

    precision = "float32" if args.f32 else "bfloat16"
    t0 = time.perf_counter()
    server = TTSServer(params, cfg, port=args.port, precision=precision,
                       warmup=True, batch_window_ms=args.batch_window_ms)
    server.start()
    print(f"bench_daemon: warmup+start {time.perf_counter()-t0:.1f}s "
          f"precision={precision}", file=sys.stderr, flush=True)
    host, port = server.address
    body = json.dumps(_utterance(cfg)).encode()
    hdrs = {"Content-Type": "application/json"}

    def conn():
        return http.client.HTTPConnection(host, port, timeout=300)

    def prime(path, attempts=3):
        # The axon tunnel intermittently stalls for minutes (r4 battery:
        # 3 of 4 daemon legs lost their first post-warmup dispatch to a
        # stall window while the leg that ran between stalls measured
        # cleanly).  Retry the untimed priming request instead of losing
        # the whole leg to one stall.
        for i in range(attempts):
            try:
                c = conn()
                c.request("POST", path, body, hdrs)
                c.getresponse().read()
                return
            except (OSError, http.client.HTTPException) as e:
                print(f"bench_daemon: priming {path} attempt {i + 1}/"
                      f"{attempts} failed ({type(e).__name__}: {e}); "
                      "tunnel stall? retrying", file=sys.stderr, flush=True)
        raise SystemExit(f"bench_daemon: priming {path} failed "
                         f"{attempts} times — backend unreachable")

    # one untimed request per endpoint (first-hit caches: buckets, sockets)
    prime("/synthesize")
    prime("/stream")

    # raw-binary request body A/B: same utterance, application/octet-stream
    # (the daemon's zero-copy parse path) — isolates the JSON-decode share
    # of /synthesize latency (VERDICT r4 #6)
    from zerovox_tpu.runtime.server import utterance_to_binary
    utt = _utterance(cfg)
    bin_body = utterance_to_binary(utt["phonemes"], utt["style"],
                                   utt["puncts"])
    bin_hdrs = {"Content-Type": "application/octet-stream"}

    synth, synth_bin, stream_hdr, stream_ttfa, stream_full = [], [], [], [], []
    stalled = 0
    for _ in range(args.reps):
        try:
            c = conn()
            t0 = time.perf_counter()
            c.request("POST", "/synthesize", body, hdrs)
            r = c.getresponse()
            r.read()
            synth.append(time.perf_counter() - t0)
            assert r.status == 200

            c = conn()
            t0 = time.perf_counter()
            c.request("POST", "/synthesize", bin_body, bin_hdrs)
            r = c.getresponse()
            r.read()
            synth_bin.append(time.perf_counter() - t0)
            assert r.status == 200

            c = conn()
            t0 = time.perf_counter()
            c.request("POST", "/stream", body, hdrs)
            r = c.getresponse()
            r.read(44)                              # WAV header chunk
            stream_hdr.append(time.perf_counter() - t0)
            first = r.read(2)                       # first audio bytes
            stream_ttfa.append(time.perf_counter() - t0)
            rest = r.read()
            stream_full.append(time.perf_counter() - t0)
            assert r.status == 200 and len(first) == 2, (r.status, len(first))
            n_samples = (2 + len(rest)) // 2
            del rest
        except (OSError, http.client.HTTPException) as e:
            # a tunnel stall mid-battery must not void the leg: drop the
            # rep (a stalled wall is not a latency sample), keep the rest
            stalled += 1
            print(f"bench_daemon: rep lost to tunnel stall "
                  f"({type(e).__name__}); continuing", file=sys.stderr,
                  flush=True)
    if len(synth) < 3:
        raise SystemExit(f"bench_daemon: only {len(synth)} reps survived "
                         f"({stalled} stalls) — too few for a median")

    out = {
        "synthesize_p50_ms": _p50(synth),
        "synthesize_min_ms": float(min(synth) * 1e3),
        "synthesize_binary_p50_ms": _p50(synth_bin) if synth_bin else None,
        "stream_header_ttfb_p50_ms": _p50(stream_hdr),
        "stream_ttfa_p50_ms": _p50(stream_ttfa),
        "stream_ttfa_min_ms": float(min(stream_ttfa) * 1e3),
        "stream_full_p50_ms": _p50(stream_full),
        "stream_samples": int(n_samples),
        "reps": len(synth),
        "stall_dropped_reps": stalled,
        "precision": precision,
    }

    if not args.no_batch:
        utts = [_utterance(cfg, seed=s) for s in range(4)]
        bbody = json.dumps({"utterances": utts}).encode()
        c = conn(); c.request("POST", "/batch", bbody, hdrs)
        r = c.getresponse(); r.read()
        assert r.status == 200, f"warm /batch hit failed: {r.status}"
        batch = []
        for _ in range(max(3, args.reps // 3)):
            c = conn()
            t0 = time.perf_counter()
            c.request("POST", "/batch", bbody, hdrs)
            r = c.getresponse()
            r.read()
            batch.append(time.perf_counter() - t0)
            assert r.status == 200
        out["batch4_p50_ms"] = _p50(batch)

    if args.load > 0:
        # sustained throughput: N clients fire /synthesize back-to-back;
        # with --batch-window-ms > 0 the daemon coalesces them into packed
        # dispatches (linear batch scaling -> ~Nx per-chip throughput)
        import threading
        per_client = max(3, args.reps)
        lat: list = []
        failures = [0]
        lat_lock = threading.Lock()

        def client(i):
            mine, failed = [], 0
            c = conn()
            for _ in range(per_client):
                t0 = time.perf_counter()
                c.request("POST", "/synthesize", body, hdrs)
                r = c.getresponse()
                r.read()
                if r.status != 200:      # count, don't credit, keep going
                    failed += 1
                    continue
                mine.append(time.perf_counter() - t0)
            with lat_lock:
                lat.extend(mine)
                failures[0] += failed

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.load)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        # throughput counts only COMPLETED requests — a failure must not
        # inflate the recorded req/s
        out["load_clients"] = args.load
        out["load_completed"] = len(lat)
        out["load_failures"] = failures[0]
        out["load_req_s"] = round(len(lat) / wall, 2)
        out["load_p50_ms"] = _p50(lat) if lat else None
        out["batch_window_ms"] = args.batch_window_ms
        if server.batcher is not None:
            out["load_batcher"] = server.batcher.snapshot()

    if args.stream_load > 0:
        # concurrent streams: state is generator-local and the chunk
        # programs' cache is internally locked, so N streams overlap
        # their per-chunk round trips (a global lock would serialize
        # all streams to one chunk per RTT — the r4 removal this leg
        # quantifies)
        import threading
        sr = cfg.sampling_rate
        ttfa_l, samples_l = [], []
        sfail = [0]
        s_lock = threading.Lock()

        def stream_client(i):
            sbody = json.dumps(_utterance(cfg, seed=100 + i)).encode()
            mine_t, mine_n, failed = [], [], 0
            for _ in range(max(2, args.reps // 3)):
                c = conn()
                t0 = time.perf_counter()
                c.request("POST", "/stream", sbody, hdrs)
                r = c.getresponse()
                if r.status != 200:
                    failed += 1
                    r.read()
                    continue
                r.read(44)
                r.read(2)
                mine_t.append(time.perf_counter() - t0)
                rest = r.read()
                mine_n.append((2 + len(rest)) // 2)
            with s_lock:
                ttfa_l.extend(mine_t)
                samples_l.extend(mine_n)
                sfail[0] += failed

        threads = [threading.Thread(target=stream_client, args=(i,))
                   for i in range(args.stream_load)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        out["stream_load_clients"] = args.stream_load
        out["stream_load_completed"] = len(ttfa_l)
        out["stream_load_failures"] = sfail[0]
        out["stream_load_ttfa_p50_ms"] = _p50(ttfa_l) if ttfa_l else None
        out["stream_load_audio_s_per_s"] = (
            round(sum(samples_l) / sr / wall, 2) if samples_l else None)

    server.shutdown()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
