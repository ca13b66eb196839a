"""1-D convolution primitives, channels-last (TPU lane dim = channels).

The reference lowers every Conv1d through ggml's im2col + mul_mat
(/root/reference/ggml/src/ggml.c:3769) and hand-rolls ConvTranspose1d as
zero-stuffing views + a flipped-kernel conv (/root/reference/src/hifigan.cpp:22-71).
On TPU both are a single `lax.conv_general_dilated` that XLA tiles onto the MXU;
transposed convolution uses lhs_dilation instead of materialising zeros.

Layout conventions:
  activations: (B, T, C)  — NHC; channels on the 128-lane axis
  kernels:     (K, C_in, C_out) — HIO
A torch Conv1d weight (C_out, C_in, K) maps to ours via .transpose(2, 1, 0).
A torch ConvTranspose1d weight (C_in, C_out, K) maps via flip(K) then
.transpose(2, 0, 1); the reference GGUF already stores that flipped layout
(utils/zv2gguf.py:176-178), see zerovox_tpu.params.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DIMENSION_NUMBERS = ("NHC", "HIO", "NHC")


def conv1d(x: jnp.ndarray,
           w: jnp.ndarray,
           b: Optional[jnp.ndarray] = None,
           stride: int = 1,
           padding: int = 0,
           dilation: int = 1) -> jnp.ndarray:
    """Conv1d with symmetric padding.  x: (B, T, Cin), w: (K, Cin, Cout)."""
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(x: jnp.ndarray,
                     w_flipped: jnp.ndarray,
                     b: Optional[jnp.ndarray] = None,
                     stride: int = 1,
                     padding: int = 0,
                     output_padding: int = 0) -> jnp.ndarray:
    """ConvTranspose1d via input dilation.

    `w_flipped` is (K, Cin, Cout) in *flipped correlation* layout: correlating
    the stride-dilated input with it reproduces torch's ConvTranspose1d —
    exactly the scheme the reference exporter bakes in (utils/zv2gguf.py:176-178)
    and its runtime re-derives with zero-stuffing views
    (/root/reference/src/hifigan.cpp:44-65).  Here XLA's lhs_dilation does the
    zero-stuffing implicitly; nothing is materialised in HBM.

    Output length: (T-1)*stride + K - 2*padding + output_padding.
    """
    k = w_flipped.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense layer.  x: (..., Cin), w: (Cin, Cout)."""
    out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out
