"""Multi-head self-attention matching the reference FFT-block semantics.

Reference: /root/reference/src/fs2encoder.cpp:71-140 — per-layer Linear Q/K/V
(d_model -> n_head*d_k), per-head softmax(q k^T / sqrt(d_k)) v, head concat,
output Linear, residual + LayerNorm.  NOTE the reference applies **no
attention mask** over padding (src/fs2encoder.cpp:103-110); we keep that as
the default for bit parity and provide a masked mode behind a flag
(config.use_attention_mask).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .conv import linear
from .norm import layer_norm


def multi_head_attention(x: jnp.ndarray,
                         p: dict,
                         n_head: int,
                         mask: Optional[jnp.ndarray] = None,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Self-attention block.  x: (B, T, C); p holds wq/bq/wk/bk/wv/bv/wo/bo/
    ln_g/ln_b with Linear weights already in (Cin, Cout) layout.

    mask: optional (B, T) bool, True = valid position.
    """
    B, T, C = x.shape
    d_k = C // n_head
    residual = x

    q = linear(x, p["wq"], p["bq"]).reshape(B, T, n_head, d_k)
    k = linear(x, p["wk"], p["bk"]).reshape(B, T, n_head, d_k)
    v = linear(x, p["wv"], p["bv"]).reshape(B, T, n_head, d_k)

    # (B, H, T, d)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    scale = 1.0 / jnp.sqrt(jnp.asarray(d_k, dtype=jnp.float32)).astype(x.dtype)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    if mask is not None:
        attn = jnp.where(mask[:, None, None, :], attn, jnp.asarray(-1e9, attn.dtype))
    attn = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    attn = attn.astype(x.dtype)

    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)

    out = linear(out, p["wo"], p["bo"])
    return layer_norm(out + residual, p["ln_g"], p["ln_b"], eps=eps)
