"""Instrumented repro of the dynamic-batching load collapse.

Runs the daemon in-process (like bench_daemon), wraps
engine.synthesize_packed with a timer, fires N concurrent clients, then
prints a per-dispatch log: batch size, wall, and gap since the previous
dispatch ended — separating engine time from batcher idle/queue time.
"""

from __future__ import annotations

import http.client
import json
import os
import sys
import threading
import time

os.environ.setdefault(
    "ZV_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "xla-cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from zerovox_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.environ["ZV_COMPILE_CACHE"])
    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.params import init_params
    from zerovox_tpu.runtime.server import TTSServer

    cfg = ZeroVoxConfig(compute_dtype="bfloat16")
    params = init_params(cfg, seed=0)
    dp = dict(params["encoder"]["duration_predictor"])
    dp["lin_b"] = dp["lin_b"] + 1.5
    enc = dict(params["encoder"])
    enc["duration_predictor"] = dp
    params = dict(params)
    params["encoder"] = enc

    t0 = time.perf_counter()
    server = TTSServer(params, cfg, port=0, precision="bfloat16",
                       warmup=True, batch_window_ms=10.0)
    server.start()
    print(f"warmup+start {time.perf_counter()-t0:.1f}s", flush=True)

    # wrap the packed path with a timer
    log = []
    log_lock = threading.Lock()
    inner = server.engine.synthesize_packed
    last_end = [time.perf_counter()]

    def timed(*a, **kw):
        t0 = time.perf_counter()
        gap = t0 - last_end[0]
        r = inner(*a, **kw)
        t1 = time.perf_counter()
        last_end[0] = t1
        with log_lock:
            log.append((len(np.asarray(a[0])), (t1 - t0) * 1e3, gap * 1e3))
        return r

    server.engine.synthesize_packed = timed

    host, port = server.address
    rng = np.random.default_rng(0)
    body = json.dumps({
        "phonemes": rng.integers(1, cfg.num_phonemes,
                                 size=cfg.max_n_phonemes).tolist(),
        "puncts": rng.integers(0, cfg.num_puncts,
                               size=cfg.max_n_phonemes).tolist(),
        "style": rng.normal(scale=0.1, size=cfg.d_model)
                    .astype(np.float32).tolist(),
    }).encode()
    hdrs = {"Content-Type": "application/json"}

    def conn():
        return http.client.HTTPConnection(host, port, timeout=300)

    c = conn()
    c.request("POST", "/synthesize", body, hdrs)
    c.getresponse().read()
    print("primed", flush=True)

    lat = []
    lat_lock = threading.Lock()

    def client(i):
        mine = []
        c = conn()
        for _ in range(6):
            t0 = time.perf_counter()
            c.request("POST", "/synthesize", body, hdrs)
            r = c.getresponse()
            r.read()
            assert r.status == 200, r.status
            mine.append(time.perf_counter() - t0)
        with lat_lock:
            lat.extend(mine)

    with log_lock:
        log.clear()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    print(f"completed {len(lat)} in {wall:.2f}s = "
          f"{len(lat)/wall:.2f} req/s; p50 {np.median(lat)*1e3:.1f} ms",
          flush=True)
    print("dispatch log (batch, wall_ms, gap_ms):", flush=True)
    for b, w, g in log:
        print(f"  B={b}  wall={w:7.1f}  gap={g:7.1f}", flush=True)
    server.shutdown()


if __name__ == "__main__":
    main()
