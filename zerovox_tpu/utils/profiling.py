"""Profiling / timing utilities.

Replaces the reference's ggml_time_us timers and graph dumps (SURVEY §5:
ggml_graph_print, GGML_SCHED_DEBUG) with jax-native tooling:

  - device_time(): HONEST device wall time.  jax.block_until_ready does not
    synchronize through the axon TPU tunnel and a host round-trip costs
    ~30 ms, so this chains K executions on-device (lax.scan with a
    data-dependent carry, defeating CSE) and amortizes one scalar fetch.
  - trace(): context manager around jax.profiler for TensorBoard traces.
  - StageTimer: lightweight named wall-clock sections.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def device_time(fn: Callable, *args, iters: int = 10, reps: int = 3) -> float:
    """Median device seconds per fn(*args) execution.

    fn must return a pytree of arrays; a scalar data dependency is threaded
    through a lax.scan chain so the K executions cannot be collapsed.
    """
    def to_scalar(out):
        leaves = jax.tree.leaves(out)
        return sum(x.astype(jnp.float32).mean() for x in leaves
                   if hasattr(x, "astype"))

    def perturb(a, c):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a + c.astype(a.dtype)
        return a

    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(*jax.tree.map(lambda x: perturb(x, c * 1e-6), a))
            return to_scalar(out), None
        o, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32), None, length=iters)
        return o

    @jax.jit
    def chain1(*a):
        return to_scalar(fn(*a))

    float(chain1(*args))
    float(chain(*args))
    t1, tk = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain1(*args))
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(*args))
        tk.append(time.perf_counter() - t0)
    return max(0.0, (float(np.median(tk)) - float(np.median(t1))) / (iters - 1))


@contextlib.contextmanager
def trace(logdir: str = "/tmp/zerovox_trace"):
    """jax.profiler trace for TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock sections with a printable report."""

    def __init__(self):
        self.records: List[tuple] = []

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        yield
        self.records.append((name, time.perf_counter() - t0))

    def report(self) -> str:
        total = sum(t for _, t in self.records) or 1e-12
        lines = [f"{n:30s} {t*1e3:9.2f} ms {100*t/total:5.1f}%"
                 for n, t in self.records]
        return "\n".join(lines)
