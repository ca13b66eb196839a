"""Static-shape length regulator.

The reference implements this as a scalar host loop with per-phoneme memcpy
(/root/reference/src/fs2encoder.cpp:611-655): for each phoneme i,
dur_i = (int)(exp(logdur_i) - 1 + 0.5) (skip if negative), copy its feature row
dur_i times, truncate at max_seq_len, zero-pad the tail.  That loop forces a
device->host->device round-trip per utterance.

TPU-native version: fully jittable, static output shape, no host loop.
The expansion is re-expressed as a gather: frame j belongs to the phoneme whose
cumulative duration interval contains j (searchsorted over the duration cumsum),
which reproduces the reference's repeat/truncate/zero-pad semantics exactly —
including a phoneme cut mid-repeat at the max_seq_len boundary.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def durations_from_log(log_dur: jnp.ndarray, max_seq_len: int) -> jnp.ndarray:
    """round(exp(log_dur) - 1) with the reference's exact rounding.

    C code does `(int32_t)(dur + 0.5)` then skips negatives — i.e.
    max(0, floor(exp(ld) - 0.5)).  Clipped to max_seq_len pre-cast so that
    exp overflow saturates instead of wrapping.
    """
    d = jnp.floor(jnp.exp(log_dur.astype(jnp.float32)) - 0.5)
    d = jnp.clip(d, 0.0, float(max_seq_len))
    return d.astype(jnp.int32)


def length_regulate(features: jnp.ndarray,
                    durations: jnp.ndarray,
                    max_seq_len: int,
                    num_phonemes: jnp.ndarray | int | None = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand phoneme features to mel frames.

    features:  (B, P, C)
    durations: (B, P) int32 frame counts
    num_phonemes: optional (B,) valid-phoneme counts; trailing phonemes are
        given zero duration (the reference loops only over num_phonemes).

    Returns (expanded (B, max_seq_len, C), mel_len (B,) int32).
    """
    B, P, C = features.shape
    if num_phonemes is not None:
        num_phonemes = jnp.asarray(num_phonemes)
        if num_phonemes.ndim == 0:
            num_phonemes = jnp.broadcast_to(num_phonemes, (B,))
        pidx = jnp.arange(P, dtype=jnp.int32)[None, :]
        durations = jnp.where(pidx < num_phonemes[:, None], durations, 0)

    ends = jnp.cumsum(durations, axis=1)                     # (B, P) exclusive end frame
    total = jnp.minimum(ends[:, -1], max_seq_len).astype(jnp.int32)

    frame = jnp.arange(max_seq_len, dtype=jnp.int32)         # (T,)
    # phoneme index owning frame j = #{i : ends_i <= j}
    phon_idx = jnp.sum(ends[:, None, :] <= frame[None, :, None], axis=-1)  # (B, T)
    valid = frame[None, :] < total[:, None]                  # (B, T)
    phon_idx = jnp.clip(phon_idx, 0, P - 1)

    expanded = jnp.take_along_axis(features, phon_idx[:, :, None], axis=1)
    expanded = jnp.where(valid[:, :, None], expanded, jnp.zeros((), features.dtype))
    return expanded, total
