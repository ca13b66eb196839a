"""Normalisation ops with ggml-exact semantics.

The reference expresses *both* LayerNorm and InstanceNorm through `ggml_norm`,
which always normalises over ne[0] (the innermost axis):
  - LayerNorm: applied to (T, C) tensors with C innermost → normalise over
    channels (/root/reference/src/fs2encoder.cpp:132-137, eps=1e-5).
  - InstanceNorm1d: applied to (C, T) tensors with T innermost → normalise over
    time per channel, then per-channel affine via transpose + mul/add
    (/root/reference/src/stylettsdec.cpp:94-98).  This axis choice is the #1
    parity trap (the reference ships its own oracle, utils/instnorm1d.py).

Our activations are channels-last (B, T, C): LayerNorm reduces axis -1,
InstanceNorm reduces axis -2 (time).  Variance is population (no Bessel),
matching ggml_norm and torch defaults.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _normalize(x: jnp.ndarray, axis: int, eps: float) -> jnp.ndarray:
    # Compute moments in f32 regardless of activation dtype.
    xf = x.astype(jnp.float32)
    if x.dtype != jnp.float32:
        # serving path: one-pass moments (E[x], E[x^2] in a single fused
        # read) — measured 76 -> 43 us per decoder instance-norm at B=8 on
        # v5e, same ~4e-6 error vs f64 on bf16-rounded data as two-pass.
        # The f32 parity path below keeps the two-pass (catastrophic-
        # cancellation-free) form, bit-identical to the torch/ggml oracles.
        n = x.shape[axis]
        mean = jnp.sum(xf, axis=axis, keepdims=True) / n
        var = jnp.sum(xf * xf, axis=axis, keepdims=True) / n - mean * mean
        var = jnp.maximum(var, 0.0)
        return ((xf - mean) * (1.0 / jnp.sqrt(var + eps))).astype(x.dtype)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=axis, keepdims=True)
    return (centered * (1.0 / jnp.sqrt(var + eps))).astype(x.dtype)


def layer_norm(x: jnp.ndarray,
               gamma: Optional[jnp.ndarray] = None,
               beta: Optional[jnp.ndarray] = None,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the channel (last) axis.  gamma/beta: (C,)."""
    out = _normalize(x, axis=-1, eps=eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def instance_norm(x: jnp.ndarray,
                  gamma: Optional[jnp.ndarray] = None,
                  beta: Optional[jnp.ndarray] = None,
                  eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm1d over the time axis of (B, T, C) (or (T, C)) activations.

    Per-channel statistics across time; optional per-channel affine (C,).
    Matches torch nn.InstanceNorm1d(C, affine=True) on (B, C, T) inputs and the
    reference's ggml_norm-over-time construction.
    """
    out = _normalize(x, axis=-2, eps=eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out
