"""Training losses for the TTS stack.

The reference vendors a training module it never calls (ggml-opt AdamW + loss
graphs, /root/reference/ggml/src/ggml-opt.cpp, SURVEY §2c).  The TPU-native
framework makes training first-class: FastSpeech2-style variance/mel losses
with teacher forcing, plus the multi-resolution STFT auxiliary loss that
ParallelWaveGAN uses to train the HiFi-GAN generator.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """MSE over positions where mask is True."""
    mask = mask.astype(pred.dtype)
    se = (pred - target) ** 2 * mask
    return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    if mask.ndim < pred.ndim:
        mask = mask[..., None]
    mask = mask.astype(pred.dtype)
    ae = jnp.abs(pred - target) * mask
    denom = jnp.maximum(jnp.sum(mask) * (pred.shape[-1] if mask.shape[-1] == 1 else 1), 1.0)
    return jnp.sum(ae) / denom


def stft_magnitude(x: jnp.ndarray, fft_size: int, hop: int,
                   win_length: int) -> jnp.ndarray:
    """|STFT| of (B, L) signals with a Hann window -> (B, frames, fft//2+1)."""
    B, L = x.shape
    n_frames = 1 + (L - win_length) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(win_length)[None, :])
    frames = x[:, idx]                                     # (B, F, win)
    window = jnp.hanning(win_length).astype(x.dtype)
    spec = jnp.fft.rfft(frames * window, n=fft_size, axis=-1)
    return jnp.sqrt(jnp.clip(spec.real ** 2 + spec.imag ** 2, 1e-7))


def stft_loss(pred_wav: jnp.ndarray, target_wav: jnp.ndarray,
              resolutions: Sequence[Tuple[int, int, int]] = (
                  (1024, 120, 600), (2048, 240, 1200), (512, 50, 240)),
              ) -> jnp.ndarray:
    """Multi-resolution STFT loss: spectral convergence + log-magnitude L1."""
    total = 0.0
    for fft_size, hop, win in resolutions:
        p = stft_magnitude(pred_wav, fft_size, hop, win)
        t = stft_magnitude(target_wav, fft_size, hop, win)
        sc = jnp.linalg.norm(t - p) / jnp.maximum(jnp.linalg.norm(t), 1e-7)
        mag = jnp.mean(jnp.abs(jnp.log(t) - jnp.log(p)))
        total = total + sc + mag
    return total / len(resolutions)


def tts_losses(mel_pred, mel_target, mel_mask,
               log_dur_pred, dur_target, phoneme_mask,
               wav_pred=None, wav_target=None,
               stft_resolutions=None) -> Dict[str, jnp.ndarray]:
    """Combined loss dict.  dur_target is in frames; compared in log space
    against the predictor's log(d+1) parameterisation."""
    log_dur_target = jnp.log(dur_target.astype(jnp.float32) + 1.0)
    out = {
        "mel_l1": masked_l1(mel_pred, mel_target, mel_mask),
        "duration_mse": masked_mse(log_dur_pred, log_dur_target, phoneme_mask),
    }
    if wav_pred is not None and wav_target is not None:
        kw = {} if stft_resolutions is None else {"resolutions": stft_resolutions}
        out["stft"] = stft_loss(wav_pred, wav_target, **kw)
    out["total"] = sum(v for k, v in out.items())
    return out
