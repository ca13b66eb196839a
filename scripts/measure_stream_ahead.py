"""Dispatch-ahead A/B for the streaming path on the real chip.

The stream loop pays one ~30 ms tunnel round trip per chunk because each
iteration dispatches chunk k and immediately blocks on its fetch: a full
1500-frame utterance at 64-frame chunks is 24 serialized RTTs (~870 ms
measured via the daemon).  Chunk programs are independent given the mel,
so dispatching W chunks ahead and starting their host copies
asynchronously should overlap the RTTs.

Measures the full-stream wall for ahead = 0 (today's loop), 2, 4, and
all-at-once, plus TTFA to confirm the first chunk is unaffected.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "ZV_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "xla-cache"))

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from zerovox_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.environ["ZV_COMPILE_CACHE"])
    import jax
    import jax.numpy as jnp
    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.params import init_params
    from zerovox_tpu.models.streaming import StreamingSynthesizer

    cfg = ZeroVoxConfig(compute_dtype="bfloat16")
    params = init_params(cfg, seed=0)
    # duration bias -> long utterance (the daemon-bench trick)
    dp = dict(params["encoder"]["duration_predictor"])
    dp["lin_b"] = dp["lin_b"] + 1.5
    enc = dict(params["encoder"])
    enc["duration_predictor"] = dp
    params = dict(params)
    params["encoder"] = enc

    s = StreamingSynthesizer(params, cfg, chunk_frames=64, overlap=16,
                             pcm16=True)
    t0 = time.perf_counter()
    s.warmup(batch=1)
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    P, D = cfg.max_n_phonemes, cfg.d_model
    src = rng.integers(1, cfg.num_phonemes, size=(1, P)).astype(np.int32)
    pun = rng.integers(0, cfg.num_puncts, size=(1, P)).astype(np.int32)
    sty = rng.normal(scale=0.1, size=(1, D)).astype(np.float32)

    # ---- baseline: the pre-r4 serialized loop (ahead=1).  The shipped
    # default is now ahead=None (unbounded dispatch-ahead), so s.stream()
    # no longer measures a serial baseline — build an explicit ahead=1
    # synthesizer sharing the same programs via the compile cache.
    s_serial = StreamingSynthesizer(params, cfg, chunk_frames=64, overlap=16,
                                    pcm16=True, ahead=1)
    # share the compiled chunk/prefix programs (same geometry)
    s_serial._programs = s._programs
    s_serial._sprograms = s._sprograms

    def run_serial():
        t0 = time.perf_counter()
        ttfa = None
        chunks = []
        for c in s_serial.stream(src, pun, sty):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            chunks.append(c)
        return time.perf_counter() - t0, ttfa, np.concatenate(chunks, axis=1)

    # ---- shipped path: s.stream() with the default unbounded ahead --------
    def run_shipped():
        t0 = time.perf_counter()
        ttfa = None
        chunks = []
        for c in s.stream(src, pun, sty):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            chunks.append(c)
        return time.perf_counter() - t0, ttfa, np.concatenate(chunks, axis=1)

    # ---- prototype: dispatch-ahead with async host copies -----------------
    def run_ahead(W):
        from collections import deque
        t0 = time.perf_counter()
        ttfa = None
        cfg_ = s.cfg
        src_ = jnp.asarray(src, jnp.int32)
        pun_ = jnp.asarray(pun, jnp.int32)
        sty_ = jnp.asarray(sty, jnp.float32)
        nph = jnp.full((1,), cfg_.max_n_phonemes, jnp.int32)
        mel, mel_len, max_len_dev = s._prefix(s.params, src_, pun_, sty_, nph)
        ws, size, e_from, e_frames = s.chunk_plan(mel.shape[1], 1)[0]
        first = s._sprogram(size, e_from, e_frames)(s.params, mel, ws)
        first_h, max_len = jax.device_get((first, max_len_dev))
        n_chunks = max(1, -(-int(max_len) // s.chunk_frames))
        ttfa = time.perf_counter() - t0
        chunks = [np.asarray(first_h)]
        plan = s.chunk_plan(mel.shape[1], n_chunks)[1:]
        pending = deque()
        for step in plan:
            while len(pending) > W:
                chunks.append(np.asarray(jax.device_get(pending.popleft())))
            ws, size, e_from, e_frames = step
            d = s._sprogram(size, e_from, e_frames)(s.params, mel, ws)
            try:
                d.copy_to_host_async()
            except AttributeError:
                pass
            pending.append(d)
        while pending:
            chunks.append(np.asarray(jax.device_get(pending.popleft())))
        return time.perf_counter() - t0, ttfa, np.concatenate(chunks, axis=1)

    run_serial()   # warm
    out = {}
    reps = 5
    base = None
    for name, fn in [("serial", run_serial),
                     ("ahead2", lambda: run_ahead(2)),
                     ("ahead4", lambda: run_ahead(4)),
                     ("ahead_all", lambda: run_ahead(10 ** 6)),
                     ("shipped", run_shipped)]:
        walls, ttfas = [], []
        for _ in range(reps):
            w, t, wav = fn()
            walls.append(w)
            ttfas.append(t)
        if base is None:
            base = wav
        else:
            assert np.array_equal(base, wav), f"{name} output differs!"
        out[f"{name}_full_ms"] = float(np.median(walls) * 1e3)
        out[f"{name}_ttfa_ms"] = float(np.median(ttfas) * 1e3)
        print(json.dumps({k: v for k, v in out.items() if name in k}),
              flush=True)
    out["n_samples"] = int(base.shape[1])
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
