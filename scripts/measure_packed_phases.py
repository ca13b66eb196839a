"""Phase-cost breakdown of the batched serving path on the real chip.

Answers the r4 question: why does dynamic batching (synthesize_packed per
dispatch) sustain 4.88 req/s where 8 concurrent B=1 single-RTT requests
sustain 40.72 req/s (scripts/bench_daemon.py --load 8 A/B)?

Phases measured, all post-warmup:
  1. B=1 single-RTT synthesize wall (the OFF-mode unit of work)
  2. packed B=k synthesize_packed wall + its internal phases:
       front dispatch -> mel_len fetch; per-group vocoder dispatch -> wav fetch
  3. raw device_get bandwidth: (8, max_samples) int16 in one fetch
  4. fetch concurrency: two (4, max_samples) int16 fetches serial vs 2 threads
  5. dispatch/fetch overlap: dispatch batch k+1 before fetching batch k

Writes one JSON line per result; run with stdbuf -oL and a long timeout
(first compiles ride the persistent cache).
"""

from __future__ import annotations

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


def p50(xs):
    return float(np.median(xs) * 1e3)


def main():
    from zerovox_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.environ["ZV_COMPILE_CACHE"])
    import jax
    import jax.numpy as jnp
    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.params import init_params
    from zerovox_tpu.runtime.engine import TTSEngine

    cfg = ZeroVoxConfig(compute_dtype="bfloat16")
    params = init_params(cfg, seed=0)
    eng = TTSEngine(params, cfg, precision="bfloat16")
    print("warmup...", flush=True)
    t0 = time.perf_counter()
    eng.warmup(batch=eng.batch_ladder[-1], pcm16=True)
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    P, D = cfg.max_n_phonemes, cfg.d_model

    def utts(B, seed=0):
        r = np.random.default_rng(seed)
        return (r.integers(1, cfg.num_phonemes, size=(B, P)).astype(np.int32),
                r.integers(0, cfg.num_puncts, size=(B, P)).astype(np.int32),
                r.normal(scale=0.1, size=(B, D)).astype(np.float32),
                np.full((B,), P, np.int32))

    reps = 8
    out = {}

    # -- 1. B=1 single-RTT wall --------------------------------------------
    s1 = utts(1, 1)
    eng.synthesize(*s1[:3], num_phonemes=s1[3], pcm16=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        eng.synthesize(*s1[:3], num_phonemes=s1[3], pcm16=True)
        ts.append(time.perf_counter() - t0)
    out["b1_single_rtt_ms"] = p50(ts)
    print(json.dumps({"b1_single_rtt_ms": out["b1_single_rtt_ms"]}), flush=True)

    # -- 2. packed B=3 wall + internal phases ------------------------------
    for B in (3, 8):
        sB = utts(B, 2)
        eng.synthesize_packed(*sB[:3], num_phonemes=sB[3], pcm16=True)
        walls, fronts, vocs = [], [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            mel, mel_len_h = eng._run_front(*sB[:3], sB[3])
            t1 = time.perf_counter()
            groups = eng.group_by_bucket(mel_len_h)
            for bucket, idxs in groups.items():
                for padded, n in eng._ladder_chunks(idxs):
                    mel_g = jnp.take(mel, jnp.asarray(padded, jnp.int32),
                                     axis=0)
                    wav = eng._back_fn(bucket, True)(
                        eng.params, mel_g[:, :bucket])
                    jax.device_get(wav)
            t2 = time.perf_counter()
            walls.append(t2 - t0)
            fronts.append(t1 - t0)
            vocs.append(t2 - t1)
        out[f"packed_b{B}_wall_ms"] = p50(walls)
        out[f"packed_b{B}_front_ms"] = p50(fronts)
        out[f"packed_b{B}_voc_fetch_ms"] = p50(vocs)
        out[f"packed_b{B}_groups"] = len(groups)
        print(json.dumps({k: v for k, v in out.items()
                          if f"_b{B}_" in k or k.endswith(f"b{B}_groups")}),
              flush=True)

    # -- 3. raw fetch bandwidth --------------------------------------------
    # a FRESH device array per rep: jax caches the host copy on the array
    # after the first device_get, so re-fetching the same object times a
    # dict lookup (microseconds), not the tunnel (the bug behind an
    # earlier fetch8_ms of 0.007 ms for 7.2 MB)
    n_samp = cfg.max_seq_len * cfg.hop_size

    @jax.jit
    def fill8(i):
        return jnp.full((8, n_samp), i, jnp.int16)

    ts = []
    for i in range(reps):
        x = fill8(i)
        x.block_until_ready()
        t0 = time.perf_counter()
        jax.device_get(x)
        ts.append(time.perf_counter() - t0)
    mb = 8 * n_samp * 2 / 1e6
    out["fetch8_ms"] = p50(ts)
    out["fetch_mb"] = mb
    out["fetch_mb_s"] = mb / (out["fetch8_ms"] / 1e3)
    print(json.dumps({k: out[k] for k in ("fetch8_ms", "fetch_mb",
                                          "fetch_mb_s")}), flush=True)

    # -- 4. fetch concurrency (fresh arrays per rep, same reason) ----------
    @jax.jit
    def fill4(i):
        return jnp.full((4, n_samp), i, jnp.int16)

    ts_ser, ts_par = [], []
    for i in range(reps):
        a, b = fill4(2 * i), fill4(2 * i + 1)
        jax.block_until_ready((a, b))
        t0 = time.perf_counter()
        jax.device_get(a)
        jax.device_get(b)
        ts_ser.append(time.perf_counter() - t0)
        a, b = fill4(1000 + 2 * i), fill4(1000 + 2 * i + 1)
        jax.block_until_ready((a, b))
        th = threading.Thread(target=jax.device_get, args=(a,))
        t0 = time.perf_counter()
        th.start()
        jax.device_get(b)
        th.join()
        ts_par.append(time.perf_counter() - t0)
    out["fetch_2x4_serial_ms"] = p50(ts_ser)
    out["fetch_2x4_threads_ms"] = p50(ts_par)
    print(json.dumps({k: out[k] for k in ("fetch_2x4_serial_ms",
                                          "fetch_2x4_threads_ms")}),
          flush=True)

    # -- 5. dispatch/fetch overlap: 4 packed batches serial vs pipelined ---
    sB = utts(8, 3)
    src, pun, sty, nph = (jnp.asarray(v) for v in sB)
    bucket = eng.mel_buckets[-1]

    def dispatch():
        mel, mel_len = eng._front(eng.params, src, pun, sty, nph)
        wav = eng._back_fn(bucket, True)(eng.params, mel[:, :bucket])
        return wav, mel_len

    dispatch()  # warm
    K = 4
    t0 = time.perf_counter()
    for _ in range(K):
        jax.device_get(dispatch())
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    handles = [dispatch() for _ in range(K)]      # all async
    for h in handles:
        jax.device_get(h)
    t_pipe = time.perf_counter() - t0

    # fetch pool: dispatches async + concurrent fetch threads
    t0 = time.perf_counter()
    handles = [dispatch() for _ in range(K)]
    threads = [threading.Thread(target=jax.device_get, args=(h,))
               for h in handles]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    t_pool = time.perf_counter() - t0

    out["pipeline_serial_ms"] = t_serial * 1e3
    out["pipeline_async_dispatch_ms"] = t_pipe * 1e3
    out["pipeline_fetch_pool_ms"] = t_pool * 1e3
    print(json.dumps({k: out[k] for k in (
        "pipeline_serial_ms", "pipeline_async_dispatch_ms",
        "pipeline_fetch_pool_ms")}), flush=True)

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
