"""Streaming synthesis: incremental chunked vocoding for low-latency TTFA.

The reference always vocodes the entire padded max_seq_len buffer before any
audio exists (/root/reference/src/zerovox.cpp:334, :369) — time-to-first-audio
equals full-utterance latency.  Config 5 of BASELINE.json asks for the TPU
replacement: run the (cheap) encoder + decoder once, then vocode the mel in
fixed-size chunks with overlap >= the vocoder's receptive field and emit audio
incrementally.

Correctness: interior chunks take `overlap` frames of *real* mel context on
each side; since the vocoder's receptive field (~8 mel frames: k=7 input conv
+ dilation<=5 resblocks at decreasing rates) is below the overlap, the emitted
central region is numerically identical to the full run.  Utterance edges are
NOT padded with zero mel — zero mel is not a zero activation (biases + the
(mel-mean)/scale normalisation) — instead the first/last chunks run dedicated
shorter-window programs whose convs zero-pad activations exactly like the full
run.  Exactness is verified in tests/test_streaming.py; default overlap 16 is
2x safety.

The StyleTTS decoder cannot be chunked (its instance norms are global over
time) and is not the bottleneck; it runs in the prefix step.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ZeroVoxConfig
from ..ops import durations_from_log, length_regulate
from . import fs2_encoder, styletts_decoder, hifigan


class StreamingSynthesizer:
    """Two-phase streaming pipeline: jitted prefix (encoder+decoder) and a
    jitted fixed-shape vocoder chunk, called repeatedly."""

    def __init__(self, params, cfg: ZeroVoxConfig,
                 chunk_frames: int = 60, overlap: int = 16):
        if chunk_frames <= 0 or overlap < 0:
            raise ValueError("chunk_frames must be > 0, overlap >= 0")
        if cfg.max_seq_len % chunk_frames != 0:
            raise ValueError(f"chunk_frames={chunk_frames} must divide "
                             f"max_seq_len={cfg.max_seq_len}")
        if chunk_frames < overlap:
            raise ValueError("chunk_frames must be >= overlap")
        # small chunk windows favor the XLA folded path (the fused pallas
        # kernel's per-call DMA overhead dominates at short L): measured TTFA
        # 69.9 ms folded vs 90.3 ms pallas
        if cfg.vocoder_backend == "auto":
            cfg = cfg.replace(vocoder_backend="folded")
        self.params = params
        self.cfg = cfg
        self.chunk_frames = chunk_frames
        self.overlap = overlap

        cfg_ = cfg

        @jax.jit
        def prefix(params, src_seq, puncts, style_embed, num_phonemes):
            features, log_dur = fs2_encoder.encode(
                params, cfg_, src_seq, puncts, style_embed)
            durations = durations_from_log(log_dur, cfg_.max_seq_len)
            hidden, mel_len = length_regulate(
                features, durations, cfg_.max_seq_len, num_phonemes=num_phonemes)
            mel = styletts_decoder.decode(params, cfg_, hidden, style_embed)
            return mel, mel_len

        window = chunk_frames + 2 * overlap
        hop = cfg.hop_size

        def chunk_fn(emit_from: int):
            @jax.jit
            def f(params, mel_window):
                wav = hifigan.vocode(params, cfg_, mel_window)
                return wav[:, emit_from * hop: (emit_from + chunk_frames) * hop]
            return f

        self._prefix = prefix
        self._vocode_interior = chunk_fn(overlap)   # window: ov + chunk + ov
        self._vocode_first = chunk_fn(0)            # window: chunk + ov
        self._vocode_last = chunk_fn(overlap)       # window: ov + chunk
        self._vocode_full = jax.jit(lambda p, m: hifigan.vocode(p, cfg_, m))
        self._window = window

    def warmup(self, batch: int = 1):
        """Trigger all compiles off the latency path."""
        cfg = self.cfg
        ov, ch = self.overlap, self.chunk_frames
        src = jnp.zeros((batch, cfg.max_n_phonemes), jnp.int32)
        style = jnp.zeros((batch, cfg.d_model), jnp.float32)
        mel, _ = self._prefix(self.params, src, src, style,
                              jnp.zeros((batch,), jnp.int32))
        mk = lambda n: jnp.zeros((batch, n, cfg.num_mels), mel.dtype)
        self._vocode_first(self.params, mk(ch + ov))
        self._vocode_interior(self.params, mk(ov + ch + ov))
        self._vocode_last(self.params, mk(ov + ch))

    def chunk_plan(self, T: int, n_chunks: int):
        """Static plan: per chunk, (program kind, window start, window size).

        Interior chunks take `overlap` frames of real mel context per side;
        chunks touching the true buffer edges run shorter-window programs so
        the convs' own zero padding applies there, exactly as in a full run.
        """
        ov, ch = self.overlap, self.chunk_frames
        plan = []
        for c in range(n_chunks):
            start, end = c * ch, (c + 1) * ch
            left_edge, right_edge = start == 0, end == T
            if left_edge and right_edge:
                plan.append(("full", 0, T))
            elif left_edge:
                plan.append(("first", 0, ch + ov))
            elif right_edge:
                plan.append(("last", start - ov, ov + ch))
            else:
                plan.append(("interior", start - ov, ov + ch + ov))
        return plan

    def program(self, kind: str):
        return {"full": self._vocode_full, "first": self._vocode_first,
                "last": self._vocode_last,
                "interior": self._vocode_interior}[kind]

    def vocode_chunks(self, mel: jnp.ndarray, n_chunks: int):
        """Yield (B, chunk_frames*hop) waveform chunks, bit-matching the full
        vocoder run."""
        sl = jax.lax.dynamic_slice_in_dim
        for kind, start, size in self.chunk_plan(mel.shape[1], n_chunks):
            yield self.program(kind)(self.params, sl(mel, start, size, axis=1))

    def stream(self, src_seq, puncts, style_embed,
               num_phonemes=None) -> Iterator[np.ndarray]:
        """Yield waveform chunks (B, chunk_frames*hop) as they are computed.

        The first yield is the TTFA point.  Chunks past mel_len are not
        computed (unlike the reference, which always vocodes the padded tail).
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

        mel, mel_len = self._prefix(self.params, src_seq, puncts,
                                    style_embed, num_phonemes)
        max_len = int(jax.device_get(jnp.max(mel_len)))
        n_chunks = max(1, -(-max_len // self.chunk_frames))

        for chunk in self.vocode_chunks(mel, n_chunks):
            yield np.asarray(jax.device_get(chunk))

    def synthesize_full(self, src_seq, puncts, style_embed, num_phonemes=None
                        ) -> Tuple[np.ndarray, int]:
        """Collect the stream into one waveform (trimmed to mel_len*hop)."""
        chunks = list(self.stream(src_seq, puncts, style_embed, num_phonemes))
        wav = np.concatenate(chunks, axis=1)
        return wav, wav.shape[1]
