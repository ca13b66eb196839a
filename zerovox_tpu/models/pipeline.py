"""End-to-end synthesis pipeline: phonemes -> waveform, one XLA graph.

The reference runs its three stages as separate ggml graphs with host round
trips between them (hidden_state / mel are malloc'd host buffers,
/root/reference/src/zerovox.cpp:198-335, SURVEY §3.5).  Here
encoder -> length-regulator -> decoder -> vocoder is a single jit-compiled
function: intermediates never leave HBM, and XLA fuses across stage
boundaries.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ZeroVoxConfig
from ..ops import durations_from_log, length_regulate
from . import fs2_encoder, styletts_decoder, hifigan


class SynthesisResult(NamedTuple):
    wav: jnp.ndarray            # (B, max_seq_len * hop_size)
    mel: jnp.ndarray            # (B, max_seq_len, num_mels)
    mel_len: jnp.ndarray        # (B,) valid mel frames
    log_duration: jnp.ndarray   # (B, P)


def synthesize(params: dict, cfg: ZeroVoxConfig,
               src_seq: jnp.ndarray, puncts: jnp.ndarray,
               style_embed: jnp.ndarray,
               num_phonemes: Optional[jnp.ndarray] = None) -> SynthesisResult:
    """Full pipeline on batched inputs.

    src_seq / puncts: (B, P) int32 padded to max_n_phonemes
    style_embed:      (B, d_model) float
    num_phonemes:     optional (B,) int32 valid counts (defaults to P, matching
                      the reference's num_phonemes = MAX_N_PHONEMES at
                      /root/reference/src/zerovox.cpp:200)
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    style_embed = style_embed.astype(dtype)

    mask = None
    if cfg.use_attention_mask and num_phonemes is not None:
        mask = fs2_encoder.phoneme_mask(num_phonemes, src_seq.shape[-1])
    features, log_dur = fs2_encoder.encode(params, cfg, src_seq, puncts,
                                           style_embed, phoneme_mask=mask)

    durations = durations_from_log(log_dur, cfg.max_seq_len)
    hidden, mel_len = length_regulate(features, durations, cfg.max_seq_len,
                                      num_phonemes=num_phonemes)

    mel = styletts_decoder.decode(params, cfg, hidden, style_embed)
    wav = hifigan.vocode(params, cfg, mel)
    return SynthesisResult(wav=wav, mel=mel, mel_len=mel_len, log_duration=log_dur)


def jit_synthesize(params: dict, cfg: ZeroVoxConfig,
                   donate_inputs: bool = False):
    """Compile `synthesize` with the config closed over statically."""
    fn = partial(synthesize, cfg=cfg)
    return jax.jit(lambda p, s, pu, se, n=None: fn(p, src_seq=s, puncts=pu,
                                                   style_embed=se, num_phonemes=n))


def cast_params(params: dict, dtype) -> dict:
    """Cast all floating-point leaves (weights) to `dtype` (e.g. bf16 serving)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)
