"""Small ops: variance-embedding bucketizer, activations, sinusoid table.

The bucketizer replaces the reference's custom CPU op ggml_zv_mul_clamp_to_i32
(/root/reference/src/fs2encoder.cpp:442-474); the sinusoid table replicates the
export-time precompute in utils/zv2gguf.py:41-62 so checkpoints without the
baked table can be loaded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bucketize(prediction: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """clamp(round(prediction * (n_bins-1)), 0, n_bins-1) -> int32.

    The reference computes `(int32_t)(x*(n_bins-1) + 0.5)` then clamps — i.e.
    round-half-up via floor(x+0.5) for the non-negative range; negatives clamp
    to 0 either way.
    """
    bin_max = n_bins - 1
    x = prediction.astype(jnp.float32) * bin_max
    y = jnp.floor(x + 0.5)
    return jnp.clip(y, 0, bin_max).astype(jnp.int32)


def leaky_relu(x: jnp.ndarray, negative_slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))


def sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid position-encoding table, bit-matching utils/zv2gguf.py:41-62."""
    hid = np.arange(d_hid)
    denom = np.power(10000.0, 2 * (hid // 2) / d_hid)
    table = (np.arange(n_position)[:, None] / denom[None, :]).astype(np.float32)
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table
