"""StyleTTS mel decoder (TPU-native).

Reference: /root/reference/src/stylettsdec.cpp — ResBlk1d x2 encode stack, an
asr_res 1x1-conv + InstanceNorm branch, five AdainResBlk1d stages with the
asr_res features re-concatenated before the first three, and a 1x1 output conv
(graph built at :306-449).

All activations are channels-last (B, T, C); instance norms reduce the time
axis (see zerovox_tpu.ops.norm for the axis discussion).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import ZeroVoxConfig
from ..ops import conv1d, instance_norm, leaky_relu, linear
from ..utils.debug import tap

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def res_blk1d(x: jnp.ndarray, p: dict, cfg: ZeroVoxConfig) -> jnp.ndarray:
    """ResBlk1d (/root/reference/src/stylettsdec.cpp:69-149):
    shortcut(x) + [IN -> lrelu(0.2) -> conv3 -> IN -> lrelu -> conv3](x), /sqrt(2)."""
    eps = cfg.instance_norm_eps
    if "conv1x1_w" in p:
        shortcut = conv1d(x, p["conv1x1_w"])          # no bias (weight-normed conv)
    else:
        shortcut = x
    h = instance_norm(x, p["norm1_g"], p["norm1_b"], eps=eps)
    h = leaky_relu(h, 0.2)
    h = conv1d(h, p["conv1_w"], p["conv1_b"], padding=1)
    h = instance_norm(h, p["norm2_g"], p["norm2_b"], eps=eps)
    h = leaky_relu(h, 0.2)
    h = conv1d(h, p["conv2_w"], p["conv2_b"], padding=1)
    return (h + shortcut) * _INV_SQRT2


def adain(x: jnp.ndarray, style: jnp.ndarray, fc_w, fc_b, eps: float) -> jnp.ndarray:
    """AdaIN1d (/root/reference/src/stylettsdec.cpp:171-200):
    h = fc(style); gamma, beta = chunk(h, 2); (1+gamma) * IN(x) + beta."""
    h = linear(style, fc_w, fc_b)                     # (B, 2C)
    c = h.shape[-1] // 2
    gamma, beta = h[..., :c], h[..., c:]
    normed = instance_norm(x, eps=eps)
    return (1.0 + gamma)[:, None, :] * normed + beta[:, None, :]


def adain_res_blk1d(x: jnp.ndarray, style: jnp.ndarray, p: dict,
                    cfg: ZeroVoxConfig) -> jnp.ndarray:
    """AdainResBlk1d (/root/reference/src/stylettsdec.cpp:242-304)."""
    eps = cfg.instance_norm_eps
    h = adain(x, style, p["fc1_w"], p["fc1_b"], eps)
    h = leaky_relu(h, 0.2)
    h = conv1d(h, p["conv1_w"], p["conv1_b"], padding=1)
    h = adain(h, style, p["fc2_w"], p["fc2_b"], eps)
    h = leaky_relu(h, 0.2)
    h = conv1d(h, p["conv2_w"], p["conv2_b"], padding=1)
    if "conv1x1_w" in p:
        shortcut = conv1d(x, p["conv1x1_w"])
    else:
        shortcut = x
    return (h + shortcut) * _INV_SQRT2


def decode(params: dict, cfg: ZeroVoxConfig,
           hidden: jnp.ndarray, style_embed: jnp.ndarray) -> jnp.ndarray:
    """Encoder hiddens (B, T, d_model) + style (B, d_model) -> mel (B, T, num_mels)."""
    dec = params["decoder"]
    eps = cfg.instance_norm_eps

    # adopt the parameter dtype (f32 parity / bf16 serving)
    dt = dec["to_out"]["conv_w"].dtype
    hidden = hidden.astype(dt)
    style_embed = style_embed.astype(dt)

    x = res_blk1d(hidden, dec["encode0"], cfg)
    x = res_blk1d(x, dec["encode1"], cfg)

    # asr_res branch: 1x1 conv + affine InstanceNorm (src/stylettsdec.cpp:382-396)
    a = dec["asr_res"]
    asr_res = conv1d(hidden, a["conv_w"], a["conv_b"])
    asr_res = instance_norm(asr_res, a["norm_g"], a["norm_b"], eps=eps)

    # three blocks consume [x ; asr_res] along channels (src/stylettsdec.cpp:398-422)
    for name in ("decode0", "decode1", "decode2"):
        x = jnp.concatenate([x, asr_res], axis=-1)
        x = adain_res_blk1d(x, style_embed, dec[name], cfg)
    x = adain_res_blk1d(x, style_embed, dec["decode3"], cfg)
    x = adain_res_blk1d(x, style_embed, dec["decode4"], cfg)

    out = dec["to_out"]
    return tap("mel", conv1d(x, out["conv_w"], out["conv_b"]))
