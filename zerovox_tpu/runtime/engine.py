"""Serving engine: compile-cache, mel-length bucketing, batched synthesis.

The reference pays for the full max_seq_len (1500-frame / 18.75 s) graph on
every utterance regardless of actual length (/root/reference/src/zerovox.cpp:369
writes the padded tail into the WAV).  Serving on TPU wants static shapes but
not always the *largest* shape: the engine runs the cheap encoder +
length-regulator first, reads the predicted mel length, and dispatches the
heavy decoder+vocoder at the smallest pre-compiled bucket that fits.  Buckets
bound XLA recompiles to len(mel_buckets) programs, compiled lazily (or all at
once via warmup()).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ZeroVoxConfig
from ..models import fs2_encoder, styletts_decoder, hifigan
from ..models.pipeline import cast_params
from ..ops import durations_from_log, length_regulate


class TTSEngine:
    """High-level synthesis engine over a loaded model."""

    def __init__(self, params, cfg: ZeroVoxConfig,
                 mel_buckets: Sequence[int] = (256, 512, 1024),
                 precision: str = "float32"):
        if precision not in ("float32", "bfloat16"):
            raise ValueError(f"unknown precision {precision!r}")
        if precision == "bfloat16":
            params = cast_params(params, jnp.bfloat16)
            cfg = cfg.replace(compute_dtype="bfloat16")
        self.params = params
        self.cfg = cfg
        # buckets are mel-frame capacities, always ending at max_seq_len
        bks = sorted(set(int(b) for b in mel_buckets if b < cfg.max_seq_len))
        self.mel_buckets: Tuple[int, ...] = tuple(bks) + (cfg.max_seq_len,)

        cfg_ = cfg

        @jax.jit
        def front(params, src_seq, puncts, style_embed, num_phonemes):
            features, log_dur = fs2_encoder.encode(
                params, cfg_, src_seq, puncts, style_embed)
            durations = durations_from_log(log_dur, cfg_.max_seq_len)
            hidden, mel_len = length_regulate(
                features, durations, cfg_.max_seq_len, num_phonemes=num_phonemes)
            return hidden, mel_len

        self._front = front
        self._back: Dict[int, callable] = {}
        # engines are shared across serving threads; guard the compile cache
        self._lock = threading.Lock()

    def _back_fn(self, bucket: int):
        """decoder+vocoder program specialised to `bucket` mel frames."""
        with self._lock:
            if bucket not in self._back:
                cfg_ = self.cfg

                @jax.jit
                def back(params, hidden_b, style_embed):
                    mel = styletts_decoder.decode(params, cfg_, hidden_b,
                                                  style_embed)
                    wav = hifigan.vocode(params, cfg_, mel)
                    return mel, wav

                self._back[bucket] = back
            return self._back[bucket]

    def pick_bucket(self, mel_len: int) -> int:
        for b in self.mel_buckets:
            if mel_len <= b:
                return b
        return self.mel_buckets[-1]

    def warmup(self, batch: int = 1):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        src = jnp.zeros((batch, cfg.max_n_phonemes), jnp.int32)
        style = jnp.zeros((batch, cfg.d_model), jnp.float32)
        hidden, _ = self._front(self.params, src, src, style,
                                jnp.zeros((batch,), jnp.int32))
        for b in self.mel_buckets:
            self._back_fn(b)(self.params, hidden[:, :b], style.astype(hidden.dtype))

    # ------------------------------------------------------------------ API
    def synthesize(self, src_seq, puncts, style_embed,
                   num_phonemes=None, trim: bool = True
                   ) -> Tuple[List[np.ndarray], np.ndarray]:
        """Batched synthesis with bucket dispatch.

        Returns (list of per-utterance waveforms (trimmed to mel_len*hop when
        trim=True), mel_len array).  The whole batch runs at the bucket of its
        longest utterance; callers batching aggressively should group inputs
        by expected length (see group_by_bucket).
        """
        cfg = self.cfg
        src_seq = jnp.asarray(src_seq, jnp.int32)
        puncts = jnp.asarray(puncts, jnp.int32)
        style_embed = jnp.asarray(style_embed, jnp.float32)
        B = src_seq.shape[0]
        if num_phonemes is None:
            num_phonemes = jnp.full((B,), cfg.max_n_phonemes, jnp.int32)
        else:
            num_phonemes = jnp.asarray(num_phonemes, jnp.int32)

        hidden, mel_len = self._front(self.params, src_seq, puncts,
                                      style_embed, num_phonemes)
        mel_len_h = np.asarray(jax.device_get(mel_len))
        bucket = self.pick_bucket(int(mel_len_h.max()) if B else 0)

        back = self._back_fn(bucket)
        _, wav = back(self.params, hidden[:, :bucket],
                      style_embed.astype(hidden.dtype))
        wav_h = np.asarray(jax.device_get(wav), dtype=np.float32)

        if not trim:
            return [wav_h[i] for i in range(B)], mel_len_h
        return [wav_h[i, : int(mel_len_h[i]) * cfg.hop_size] for i in range(B)], mel_len_h

    def group_by_bucket(self, predicted_lens: Sequence[int]) -> Dict[int, List[int]]:
        """Group utterance indices by their mel bucket (for batch packing)."""
        groups: Dict[int, List[int]] = {}
        for i, L in enumerate(predicted_lens):
            groups.setdefault(self.pick_bucket(int(L)), []).append(i)
        return groups
