"""Persistent compilation cache: a restarted process loads programs.

The engine's warmup() keeps any REQUEST from paying a compile, but a
daemon restart re-pays every warmup compile — minutes on the TPU tunnel.
utils.enable_compile_cache persists the compiled executables; these tests
run the pipeline in two fresh subprocesses sharing one cache dir and pin
that (a) the cache fills, (b) the warm process produces bit-identical
audio, (c) the warm start is materially faster.

Subprocesses (not in-process) because jax.config compilation-cache
updates are process-global and must not leak into the rest of the suite.
"""

import json
import subprocess
import sys

SCRIPT = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")   # axon plugin overrides env
from zerovox_tpu.utils import enable_compile_cache
enable_compile_cache(sys.argv[1], min_compile_time_secs=0.0)
import numpy as np
import zerovox_tpu as zv
cfg = zv.TINY_CONFIG
params = zv.init_params(cfg, seed=0)
rng = np.random.default_rng(0)
src = rng.integers(0, cfg.num_phonemes + 1, size=(1, cfg.max_n_phonemes))
pun = rng.integers(0, cfg.num_puncts + 1, size=(1, cfg.max_n_phonemes))
style = rng.normal(scale=0.1, size=(1, cfg.d_model)).astype(np.float32)
t0 = time.perf_counter()
res = zv.jit_synthesize(params, cfg)(params, src, pun, style)
wav = np.asarray(res.wav)
print(json.dumps({"compile_s": time.perf_counter() - t0,
                  "checksum": float(np.abs(wav).sum())}))
"""


def _run(cache_dir):
    p = subprocess.run([sys.executable, "-c", SCRIPT, str(cache_dir)],
                       capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_cache_keys_independent_of_cache_dir_location(tmp_path):
    """Cache keys must not depend on the cache directory's own path.

    jax's default embeds the GPU per-fusion autotune cache path (placed
    UNDER the cache dir) into the hashed compile options, so two
    processes pointing at different directories — or one cache that was
    moved — could never share entries: every program re-keys and the
    multi-minute warmup is re-paid (observed as full recompiles in the
    r4 measurement battery).  enable_compile_cache disables that
    GPU-only embedding; this pins that the SAME program run against two
    DIFFERENT cache paths produces byte-identical key filenames."""
    a = _run(tmp_path / "cache-here")
    b = _run(tmp_path / "deeply" / "nested" / "elsewhere")
    assert a["checksum"] == b["checksum"]
    keys_a = sorted(p.name for p in (tmp_path / "cache-here").iterdir())
    keys_b = sorted(p.name for p in
                    (tmp_path / "deeply" / "nested" / "elsewhere").iterdir())
    assert keys_a == keys_b, (keys_a, keys_b)


def test_compile_cache_warm_start(tmp_path):
    cache = tmp_path / "xla-cache"
    cold = _run(cache)
    entries = list(cache.iterdir())
    assert entries, "first run must populate the cache directory"

    warm = _run(cache)
    # correctness: the deserialized executable computes the same audio
    assert warm["checksum"] == cold["checksum"]
    # the win: loading beats compiling (measured 11.1 s -> 1.4 s on this
    # pipeline; 0.7 leaves generous headroom for CI load jitter)
    assert warm["compile_s"] < 0.7 * cold["compile_s"], (cold, warm)
    # and no recompilation happened: the entry set did not grow
    assert len(list(cache.iterdir())) == len(entries)
