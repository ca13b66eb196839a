"""Isolate the stage-4 in_group=3 regroup relayout cost at B=8.

ARCHITECTURE §8 attributes ~2.5 ms of the 28.2 ms B=8 run to "regroup
reshapes + dots"; the relayout itself is the row-major reshape
(B, 37500, 384) -> (B, 112500, 128) that follows the grouped stage-4
upsample (models/hifigan.py in_group==3 branch).  Logical bytes moved:
B * 37500 * 384 * 2 (bf16) read + written = 230 MB at B=8 -> 0.56 ms
HBM floor (820 GB/s).  Before designing any Pallas relayout (the
in-VMEM form is the lane->sublane shape cast Mosaic rejects), measure
what XLA's reshape actually costs in isolation:

  a. reshape alone (jit, device_time)
  b. reshape + a consumer dot (checks whether the relayout fuses/hides)
  c. the same bytes as a pure copy (y * 1.0) — the layout-free bound

If (a) is near the copy bound, the §8 "2.5 ms" is dominated by the dots
and there is nothing to win; record the number and close.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault(
    "ZV_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "xla-cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from zerovox_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(os.environ["ZV_COMPILE_CACHE"])
    import jax
    import jax.numpy as jnp
    from zerovox_tpu.utils.profiling import device_time

    B, R, G, C = 8, 37500, 3, 128
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (B, R, G * C), jnp.bfloat16)
    w = jax.random.normal(key, (C, C), jnp.bfloat16)

    def reshape_only(y):
        return y.reshape(B, R * G, C)

    def reshape_dot(y):
        return jnp.einsum("btc,cd->btd", y.reshape(B, R * G, C), w,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def copy_only(y):
        return y * jnp.bfloat16(1.000244140625)  # forces a real pass

    def dot_unreshaped(y):
        # the same dot on the pre-reshape layout (3 stacked C-blocks),
        # mathematically different but identical FLOPs/bytes: isolates
        # the dot's own cost so (b) - (d) estimates the fused relayout
        w3 = jnp.concatenate([w, w, w], axis=0)  # (384,128)
        return jnp.einsum("btc,cd->btd", y, w3,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    out = {}
    for name, fn in [("reshape_only", reshape_only),
                     ("copy_only", copy_only),
                     ("reshape_dot", reshape_dot),
                     ("dot_unreshaped", dot_unreshaped)]:
        ms = device_time(jax.jit(fn), y, iters=10, reps=3) * 1e3
        out[name] = round(ms, 4)
        print(f"{name}: {ms:.4f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
