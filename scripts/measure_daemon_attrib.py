"""Attribute the daemon /synthesize latency gap (VERDICT r4 #6).

/synthesize p50 measures 55-91 ms against a ~30 ms tunnel RTT + ~4 ms
compute floor.  This script decomposes one warm daemon's latency into
measured layers, all from the same process/run:

  engine_ms      — engine.synthesize() wall called directly in-process
                   (device dispatch + fetch through the tunnel, incl. the
                   RTT and the int16 waveform transfer)
  handler_ms     — the server's own per-request handler p50 (GET /metrics):
                   engine + request parse + WAV framing
  client_ms      — socket-level p50 (HTTP + localhost TCP on top)
  parse_ms       — handler(json) - handler(binary): the JSON-decode share,
                   isolated by the raw-binary body A/B

so: gap-to-engine = handler - engine (parse + framing),
    gap-to-client = client - handler (HTTP/TCP + python server loop).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_daemon_attrib.py [--tiny]
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()

    try:
        from zerovox_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(os.environ.get(
            "ZV_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".cache", "xla-cache")))
    except OSError:
        pass
    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.config import TINY_CONFIG, ZeroVoxConfig
    from zerovox_tpu.params import init_params
    from zerovox_tpu.runtime.server import TTSServer, utterance_to_binary

    cfg = TINY_CONFIG if args.tiny else ZeroVoxConfig()
    params = init_params(cfg, seed=0)
    dp = dict(params["encoder"]["duration_predictor"])
    dp["lin_b"] = dp["lin_b"] + 1.5
    params = dict(params, encoder=dict(params["encoder"],
                                       duration_predictor=dp))

    rng = np.random.default_rng(0)
    ph = rng.integers(1, cfg.num_phonemes, size=cfg.max_n_phonemes)
    pu = rng.integers(0, cfg.num_puncts, size=cfg.max_n_phonemes)
    sty = rng.normal(scale=0.1, size=cfg.d_model).astype(np.float32)
    jbody = json.dumps({"phonemes": ph.tolist(), "puncts": pu.tolist(),
                        "style": sty.tolist()}).encode()
    bbody = utterance_to_binary(ph, sty, pu)

    t0 = time.perf_counter()
    server = TTSServer(params, cfg, port=0, precision="bfloat16",
                       warmup=True)
    server.start()
    print(f"warmup+start {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)
    host, port = server.address

    def post(path, body, ctype):
        c = http.client.HTTPConnection(host, port, timeout=300)
        t0 = time.perf_counter()
        c.request("POST", path, body, {"Content-Type": ctype})
        r = c.getresponse()
        r.read()
        assert r.status == 200, r.status
        return time.perf_counter() - t0

    def metrics():
        c = http.client.HTTPConnection(host, port, timeout=60)
        c.request("GET", "/metrics")
        return json.loads(c.getresponse().read())

    # primes
    post("/synthesize", jbody, "application/json")
    post("/synthesize", bbody, "application/octet-stream")

    # --- engine directly (in-process): device dispatch+fetch wall ---
    src = np.zeros((1, cfg.max_n_phonemes), np.int32); src[0] = ph
    pun = np.zeros_like(src); pun[0] = pu
    n = np.asarray([cfg.max_n_phonemes], np.int32)
    engine = server.engine
    engine.synthesize(src, pun, sty.reshape(1, -1), n, pcm16=True)  # prime
    eng = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        engine.synthesize(src, pun, sty.reshape(1, -1), n, pcm16=True)
        eng.append(time.perf_counter() - t0)

    # --- socket-level p50s, split by body format ---
    m0 = metrics()["endpoints"].get("/synthesize", {})
    base_count = m0.get("count", 0)
    cj = [post("/synthesize", jbody, "application/json")
          for _ in range(args.reps)]
    mj = metrics()["endpoints"]["/synthesize"]
    cb = [post("/synthesize", bbody, "application/octet-stream")
          for _ in range(args.reps)]
    mb = metrics()["endpoints"]["/synthesize"]

    server.shutdown()
    engine_ms = float(np.median(eng) * 1e3)
    client_json_ms = float(np.median(cj) * 1e3)
    client_bin_ms = float(np.median(cb) * 1e3)
    # handler p50s come from the server's own ring buffer; the second
    # /metrics snapshot includes both windows — use p50 deltas cautiously
    # and report the raw snapshots alongside
    out = {
        "engine_ms": round(engine_ms, 1),
        "client_json_p50_ms": round(client_json_ms, 1),
        "client_binary_p50_ms": round(client_bin_ms, 1),
        "json_minus_binary_ms": round(client_json_ms - client_bin_ms, 1),
        "handler_p50_after_json_ms": mj.get("p50_ms"),
        "handler_p50_after_all_ms": mb.get("p50_ms"),
        "requests": mb.get("count", 0) - base_count,
        "gap_client_minus_engine_ms": round(client_json_ms - engine_ms, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
