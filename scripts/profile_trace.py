"""Per-fusion device-time breakdown of the full pipeline from a real trace.

Runs the jitted pipeline N times under jax.profiler, parses the produced
trace json, aggregates complete ("X") events by name, and prints device time
per run for the top fusions.  This is the composition-truth view: isolated
per-op microbenchmarks mislead on TPU (see docs/ARCHITECTURE.md §3 t_blk
note), the trace does not.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_trace.py [--batch 8] [--f32]

Replaces the capability of the reference's printf timing sums
(/root/reference/src/zerovox.cpp:359-367) with a real profiler.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import gzip
import json
import tempfile
from collections import defaultdict


def aggregate_trace(logdir: str, runs: int):
    """Sum complete-event durations on the device 'XLA Ops' lanes only —
    host-side lanes (python dispatch, compilation) would otherwise dominate
    the aggregate with wall time that is not device time."""
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace json under {logdir}")
    by_name = defaultdict(float)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        dev_pids, op_tids = set(), set()
        for ev in events:
            if ev.get("ph") != "M":
                continue
            args = ev.get("args", {})
            if ev.get("name") == "process_name" and "TPU" in str(
                    args.get("name", "")):
                dev_pids.add(ev.get("pid"))
            if ev.get("name") == "thread_name" and "XLA Ops" in str(
                    args.get("name", "")):
                op_tids.add((ev.get("pid"), ev.get("tid")))
        for ev in events:
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            if op_tids and (ev.get("pid"), ev.get("tid")) not in op_tids:
                continue
            name = ev.get("name", "")
            if name:
                by_name[name] += ev.get("dur", 0.0)
    return {k: v / runs / 1e3 for k, v in by_name.items()}   # ms per run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--attrib", action="store_true",
                    help="aggregate by HLO source file:line (metadata) "
                         "instead of raw fusion names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.models.pipeline import synthesize, cast_params
    from zerovox_tpu.params import init_params
    from zerovox_tpu.utils.profiling import trace

    cfg = ZeroVoxConfig(
        compute_dtype="float32" if args.f32 else "bfloat16")
    params = init_params(cfg, seed=0)
    if not args.f32:
        params = cast_params(params, jnp.bfloat16)

    B = args.batch
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, cfg.num_phonemes + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    pun = jnp.asarray(rng.integers(0, cfg.num_puncts + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    style = jnp.asarray(rng.normal(scale=0.1, size=(B, cfg.d_model)),
                        jnp.float32)

    fn = jax.jit(lambda p, a, b, c: synthesize(p, cfg, a, b, c).wav)
    srcmap = {}
    if args.attrib:
        # map HLO instruction names -> (source file:line, op_name) from the
        # compiled module's metadata, so fusions print WHERE they come from
        # (this is how the §8/§11 per-site numbers were attributed)
        import re
        hlo = fn.lower(params, src, pun, style).compile().as_text()
        pat = re.compile(r'%(\S+?) = .*?metadata=\{op_name="([^"]*)"'
                         r'(?: source_file="([^"]*)" source_line=(\d+))?')
        for line in hlo.splitlines():
            m = pat.search(line)
            if m:
                name, op, f, ln = m.groups()
                srcmap[name] = ((f or "").split("/")[-1] + ":" + (ln or "?")
                                + " " + op[:60])
    fn(params, src, pun, style).block_until_ready()
    # per-op durations sum correctly even if runs overlap on device, so a
    # plain dispatch loop suffices (no data-dependent chain needed here)
    logdir = tempfile.mkdtemp(prefix="zv_trace_")
    with trace(logdir):
        for _ in range(args.runs):
            w = fn(params, src, pun, style)
        w.block_until_ready()
    import time
    time.sleep(2)   # let the profiler flush through the tunnel

    agg = aggregate_trace(logdir, args.runs)
    if srcmap:
        by = defaultdict(float)
        for name, ms in agg.items():
            by[srcmap.get(name, "(unmapped) " + name[:60])] += ms
        agg = by
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    total = sum(agg.values())
    print(f"trace: {total:.3f} ms total device time per run (B={B})")
    for name, ms in items[:args.top]:
        print(f"  {ms:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
