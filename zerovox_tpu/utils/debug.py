"""Named-intermediate capture: the TPU-native tensor_dbg.

The reference debugs numerics by copying intermediates into named graph
outputs (`tensor_dbg`, /root/reference/src/utils.cpp:19-44) and printing
value/sum summaries (`print_tensor`, :97-140); HiFiGAN permanently taps its
pre-output activation as "dbg" (/root/reference/src/hifigan.cpp:347).

Here models call tap(name, x) at probe points.  Taps are zero-cost no-ops
unless a capture is active during *tracing*: capture_run() re-traces the
function with a collection dict installed, making every tapped intermediate a
real jit output.  print_tensor-style summaries come from summarize().
"""

from __future__ import annotations

import contextvars
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np

_capture_ctx: contextvars.ContextVar = contextvars.ContextVar(
    "zerovox_tap_capture", default=None)


def tap(name: str, value):
    """Register an intermediate under `name` if a capture is active.

    Safe to call inside jitted code: the check happens at trace time.
    Returns `value` unchanged so it can be used inline.
    """
    ctx = _capture_ctx.get()
    if ctx is not None:
        ctx[name] = value
    return value


def capture_run(fn: Callable, *args, jit: bool = True,
                **kwargs) -> Tuple[Any, Dict[str, jax.Array]]:
    """Run fn with taps enabled; returns (output, {name: array}).

    The tapped dict becomes part of the jitted program's outputs, so this
    works on TPU without host callbacks.
    """
    def wrapped(*a, **kw):
        token = _capture_ctx.set({})
        try:
            out = fn(*a, **kw)
            taps = dict(_capture_ctx.get())
        finally:
            _capture_ctx.reset(token)
        return out, taps

    runner = jax.jit(wrapped) if jit else wrapped
    return runner(*args, **kwargs)


def dump_hlo(fn: Callable, *args, optimized: bool = False,
             path: str | None = None) -> str:
    """The ggml_graph_print / ggml_graph_dump_dot equivalent
    (/root/reference/ggml/src/ggml.c:6048, :6124): the traced program of
    fn(*args) as HLO text — optimized=True returns the compiled (fused)
    module, which is what actually runs.  Optionally written to `path`."""
    lowered = jax.jit(fn).lower(*args)
    text = (lowered.compile().as_text() if optimized
            else lowered.as_text())
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text


def dump_dot(fn: Callable, *args, path: str | None = None,
             max_nodes: int = 4000) -> str:
    """Rendered-graph equivalent of ggml_graph_dump_dot
    (/root/reference/ggml/src/ggml.c:6124): the traced jaxpr of
    fn(*args) as a Graphviz digraph — one node per equation (primitive +
    output shape), edges along dataflow, inputs as boxes.  Feed the
    returned text to `dot -Tsvg` exactly like the reference's output.

    The jaxpr (not the HLO) is the right altitude for eyeballing model
    structure: it maps 1:1 to the library calls that built the graph,
    before XLA fusion renames everything (dump_hlo gives that view).
    """
    closed = jax.make_jaxpr(fn)(*args)
    jaxpr = closed.jaxpr
    lines = ["digraph jaxpr {", "  rankdir=TB;",
             '  node [fontsize=10, fontname="monospace"];']
    names: Dict[Any, str] = {}

    def nm(v):
        if v not in names:
            names[v] = f"v{len(names)}"
        return names[v]

    def label(v):
        av = getattr(v, "aval", None)
        return (f"{getattr(av, 'dtype', '?')}{list(getattr(av, 'shape', []))}"
                if av is not None else "?")

    for i, v in enumerate(jaxpr.invars):
        lines.append(f'  {nm(v)} [shape=box, style=filled, '
                     f'fillcolor=lightblue, label="in{i}\\n{label(v)}"];')
    n_emitted = 0
    for eq in jaxpr.eqns:
        if n_emitted >= max_nodes:
            lines.append(f'  trunc [shape=plaintext, label="... truncated '
                         f'at {max_nodes} nodes"];')
            break
        n_emitted += 1
        out = eq.outvars[0]
        lines.append(f'  {nm(out)} [label="{eq.primitive.name}\\n'
                     f'{label(out)}"];')
        for o in eq.outvars[1:]:
            names[o] = nm(out)
        for iv in eq.invars:
            # Literals (inline constants) are unhashable non-nodes
            if not hasattr(iv, "val") and iv in names:
                lines.append(f"  {nm(iv)} -> {nm(out)};")
    for i, v in enumerate(jaxpr.outvars):
        if not hasattr(v, "val") and v in names:
            lines.append(f'  out{i} [shape=box, style=filled, '
                         f'fillcolor=lightyellow, label="out{i}"];')
            lines.append(f"  {nm(v)} -> out{i};")
    lines.append("}")
    text = "\n".join(lines)
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text


def summarize(name: str, x) -> str:
    """print_tensor-style one-line summary: shape, head values, sum."""
    a = np.asarray(x, dtype=np.float64).reshape(-1)
    head = ", ".join(f"{v:.5f}" for v in a[:3])
    tail = ", ".join(f"{v:.5f}" for v in a[-3:]) if a.size > 3 else ""
    return (f"{name} {list(np.shape(x))} = [{head} ... {tail}] "
            f"sum: {a.sum():.6f}")


def print_taps(taps: Dict[str, jax.Array]):
    for name, value in taps.items():
        print(summarize(name, value))
