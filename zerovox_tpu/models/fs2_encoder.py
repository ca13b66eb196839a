"""FastSpeech2 phoneme encoder + variance adaptor (TPU-native).

Reference: /root/reference/src/fs2encoder.cpp — one static ggml graph built in
FS2Encoder's ctor (:477-586) and a host-side length regulator (:594-656).
Here the whole stage is one pure jittable function; the length regulator lives
in zerovox_tpu.ops.length_regulator (static shapes, no host loop).

Stage structure (parity-checked against the reference graph):
  word-emb + punct-emb lookup, concatenated to d_model      (:306-316)
  + sinusoid positional table rows [0, P)                   (:323-324)
  N x FFTBlock (maskless MHA + conv-FFN)                    (:331-333)
  + style embedding broadcast                               (:550-552)
  duration predictor -> log durations                       (:554-558)
  pitch predictor -> bucketize -> pitch-emb lookup, added   (:560-569)
  energy predictor (on updated features) -> bucketize, add  (:571-578)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import ZeroVoxConfig
from ..ops import (bucketize, conv1d, layer_norm, linear, multi_head_attention)
from ..utils.debug import tap


def fft_block(x: jnp.ndarray, p: dict, cfg: ZeroVoxConfig,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FFT block: self-attention + position-wise conv feed-forward
    (/root/reference/src/fs2encoder.cpp:236-243)."""
    x = multi_head_attention(x, p["attn"], cfg.encoder_head, mask=mask,
                             eps=cfg.layer_norm_eps)
    # conv FFN (:174-228): conv k0 -> ReLU -> conv k1 -> residual + LayerNorm
    residual = x
    f = p["ffn"]
    k0, k1 = cfg.conv_kernel_size
    h = conv1d(x, f["w1"], f["b1"], padding=(k0 - 1) // 2)
    h = jnp.maximum(h, 0)
    h = conv1d(h, f["w2"], f["b2"], padding=(k1 - 1) // 2)
    return layer_norm(h + residual, f["ln_g"], f["ln_b"], eps=cfg.layer_norm_eps)


def variance_predictor(x: jnp.ndarray, p: dict, cfg: ZeroVoxConfig) -> jnp.ndarray:
    """conv->ReLU->LN->conv->ReLU->LN->linear, squeezed to (B, P)
    (/root/reference/src/fs2encoder.cpp:386-440)."""
    pad = (cfg.vp_kernel_size - 1) // 2
    h = conv1d(x, p["conv1_w"], p["conv1_b"], padding=pad)
    h = jnp.maximum(h, 0)
    h = layer_norm(h, p["ln1_g"], p["ln1_b"], eps=cfg.layer_norm_eps)
    h = conv1d(h, p["conv2_w"], p["conv2_b"], padding=pad)
    h = jnp.maximum(h, 0)
    h = layer_norm(h, p["ln2_g"], p["ln2_b"], eps=cfg.layer_norm_eps)
    return linear(h, p["lin_w"], p["lin_b"])[..., 0]


def phoneme_mask(num_phonemes: jnp.ndarray, P: int) -> jnp.ndarray:
    """(B,) valid counts -> (B, P) bool mask (True = real phoneme).

    Used by every entry point (pipeline/engine/streaming/training) when
    cfg.use_attention_mask is set; the reference attends freely over padding
    (src/fs2encoder.cpp:103-110), so the default leaves this off."""
    idx = jnp.arange(P, dtype=jnp.int32)
    return idx[None, :] < jnp.asarray(num_phonemes, jnp.int32)[:, None]


def encode(params: dict, cfg: ZeroVoxConfig,
           src_seq: jnp.ndarray, puncts: jnp.ndarray,
           style_embed: jnp.ndarray,
           phoneme_mask: Optional[jnp.ndarray] = None,
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phonemes -> (features (B, P, d_model), log_duration (B, P)).

    src_seq/puncts: (B, P) int32, style_embed: (B, d_model).
    phoneme_mask: optional (B, P) bool — only applied when
    cfg.use_attention_mask (the reference attends over padding).
    """
    enc = params["encoder"]
    x = jnp.concatenate(
        [enc["word_emb"][src_seq], enc["punct_emb"][puncts]], axis=-1)
    P = src_seq.shape[-1]
    x = x + enc["pos_table"][:P].astype(x.dtype)

    attn_mask = phoneme_mask if cfg.use_attention_mask else None
    for layer in enc["layers"]:
        x = fft_block(x, layer, cfg, mask=attn_mask)
    tap("encoder_output", x)

    # style embedding broadcast add (src/fs2encoder.cpp:550-552)
    features = x + style_embed[:, None, :].astype(x.dtype)

    log_duration = variance_predictor(features, enc["duration_predictor"], cfg)

    pitch = tap("pitch", variance_predictor(features, enc["pitch_predictor"],
                                            cfg))
    pitch_emb = enc["pitch_emb"][bucketize(pitch, cfg.ve_n_bins)].astype(x.dtype)
    features = features + pitch_emb

    # energy is predicted on the pitch-updated features (src/fs2encoder.cpp:571-578)
    energy = tap("energy", variance_predictor(features,
                                              enc["energy_predictor"], cfg))
    energy_emb = enc["energy_emb"][bucketize(energy, cfg.ve_n_bins)].astype(x.dtype)
    features = features + energy_emb

    tap("features", features)
    tap("log_duration", log_duration)
    return features, log_duration
