"""Tensor-parallel serving engine: the daemon over a model>1 mesh.

`TTSEngine` serves pure-DP meshes (each chip runs the complete local
pipeline on its batch slice).  When the model axis is nontrivial — a
checkpoint too large for one chip, or latency scaling ACROSS chips for a
single utterance — serving rides `parallel.make_sharded_synthesize`
instead: encoder/decoder channel-sharded (Megatron pairing, GSPMD
collectives over ICI) and the vocoder time-sharded per model-axis device
so the fused Pallas kernels stay on the hot path (parallel/infer.py).

This adapter gives that regime the same production surface the DP engine
has: a bounded compile-key ladder, warmup() covering every program a
request can hit, device-side PCM16, a dispatch/fetch split for the
dynamic batcher, and same-geometry weights hot-reload.  Mel-length
bucketing is intentionally absent: the TP vocoder's time-chunk geometry
is derived from the FULL max_seq_len buffer (time_shard_geometry), so
every dispatch vocodes the padded buffer — the reference's own behavior
(/root/reference/src/zerovox.cpp:369) — and compile keys are just the
ladder sizes.

Replaces the capability of ggml's multi-backend row-split scheduler
(/root/reference/ggml/src/ggml-backend.cpp:1298-1660) at the serving
layer.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ZeroVoxConfig
from ..models.pipeline import cast_params
from .engine import TTSEngine


class TPServingEngine:
    """Serving facade over a tensor-parallel sharded synthesize fn."""

    # the ladder helpers are engine-agnostic (they only read
    # self.batch_ladder); share TTSEngine's implementations
    ladder_size = TTSEngine.ladder_size
    _ladder_chunks = TTSEngine._ladder_chunks
    _host_wav = staticmethod(TTSEngine._host_wav)
    _trim = TTSEngine._trim

    def __init__(self, params, cfg: ZeroVoxConfig, mesh,
                 precision: str = "float32",
                 batch_ladder: Sequence[int] = (1, 2, 4, 8),
                 time_shard_vocoder: Optional[bool] = None):
        from ..parallel.infer import make_sharded_synthesize
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

        if precision not in ("float32", "bfloat16"):
            raise ValueError(f"unknown precision {precision!r}")
        if precision == "bfloat16":
            params = cast_params(params, jnp.bfloat16)
            cfg = cfg.replace(compute_dtype="bfloat16")
        if mesh.shape.get(MODEL_AXIS, 1) <= 1:
            raise ValueError("TPServingEngine needs a model axis > 1; "
                             "use TTSEngine for pure-DP meshes")
        self.mesh = mesh
        self.cfg = cfg
        self.host_params = params
        self._n_data = mesh.shape.get(DATA_AXIS, 1)
        self.params, self._fn = make_sharded_synthesize(
            cfg, mesh, params, time_shard_vocoder=time_shard_vocoder)
        # no mel bucketing under TP (module docstring); /healthz reports
        # the one effective bucket
        self.mel_buckets: Tuple[int, ...] = (cfg.max_seq_len,)
        if not batch_ladder:
            raise ValueError("batch_ladder must be non-empty")
        # every dispatch splits evenly over the data axis
        self.batch_ladder: Tuple[int, ...] = tuple(sorted(set(
            int(b) * self._n_data for b in batch_ladder)))
        self._call: Dict[bool, callable] = {}
        self._lock = threading.Lock()

    def _call_fn(self, pcm16: bool):
        """(wav, mel_len) program; pcm16 appends device-side quantisation
        (same rationale as TTSEngine._back_fn: the host fetch of a fresh
        full-length waveform is transfer-bound and int16 halves it).

        The quantisation is JITTED as its own program (elementwise, so it
        inherits the wav's data-axis sharding): running it eagerly costs
        one tunnel round trip per op — more than the transfer saving the
        int16 fetch buys (CLAUDE.md: always jit before the tunnel).  One
        compile key per ladder size, covered by warmup().  The inner
        sharded program is left untouched — re-jitting the composition
        would discard make_sharded_synthesize's in_shardings."""
        with self._lock:
            if pcm16 not in self._call:
                fn = self._fn
                if pcm16:
                    from ..io.wav import float_to_pcm16_device
                    quant = jax.jit(float_to_pcm16_device)

                def call(p, src, pun, style, n):
                    res = fn(p, src, pun, style, n)
                    wav = res.wav
                    if pcm16:
                        wav = quant(wav)
                    return wav, res.mel_len

                self._call[pcm16] = call
            return self._call[pcm16]

    def warmup(self, batch: int = 1, pcm16: bool = False):
        """Compile every ladder program up to ladder_size(batch); outputs
        are fetched so the backlog drains before serving starts (see
        TTSEngine.warmup)."""
        cfg = self.cfg
        sizes = sorted(s for s in self.batch_ladder
                       if s <= self.ladder_size(batch))
        variants = (False, True) if pcm16 else (False,)
        outs = []
        for s in sizes:
            src = jnp.zeros((s, cfg.max_n_phonemes), jnp.int32)
            style = jnp.zeros((s, cfg.d_model), jnp.float32)
            for v in variants:
                outs.append(self._call_fn(v)(self.params, src, src, style,
                                             None))
        jax.device_get(outs)

    def reload_params(self, params):
        """Same-geometry hot swap: each new leaf is placed with the OLD
        leaf's sharding (channel-sharded where it was, replicated where it
        was), so every compiled program stays valid — no recompiles."""
        if self.cfg.compute_dtype == "bfloat16":
            params = cast_params(params, jnp.bfloat16)
        TTSEngine._validate_same_geometry(self.host_params, params)
        self.host_params = params
        self.params = jax.tree.map(
            lambda new, old: jax.device_put(new, old.sharding),
            params, self.params)

    # ------------------------------------------------------------------ API
    def synthesize_async(self, src_seq, puncts, style_embed,
                         num_phonemes=None, trim: bool = True,
                         pcm16: bool = False):
        """Dispatch without blocking; returns fetch() (the contract the
        DynamicBatcher pipelines on — see TTSEngine.synthesize_async)."""
        cfg = self.cfg
        B0 = int(np.shape(src_seq)[0])
        if B0 == 0:
            raise ValueError("empty batch")
        src = jnp.asarray(src_seq, jnp.int32)
        pun = jnp.asarray(puncts, jnp.int32)
        sty = jnp.asarray(style_embed, jnp.float32)
        nph = (jnp.full((B0,), cfg.max_n_phonemes, jnp.int32)
               if num_phonemes is None
               else jnp.asarray(num_phonemes, jnp.int32))
        call = self._call_fn(pcm16)
        chunks = []
        for padded, n in self._ladder_chunks(range(B0)):
            if padded == list(range(B0)):
                s, p, st, np_ = src, pun, sty, nph
            else:
                idx = jnp.asarray(padded, jnp.int32)
                s, p, st, np_ = (jnp.take(a, idx, axis=0)
                                 for a in (src, pun, sty, nph))
            wav, mel_len = call(self.params, s, p, st, np_)
            chunks.append((wav, mel_len, n))

        def fetch() -> Tuple[List[np.ndarray], np.ndarray]:
            wavs: List[np.ndarray] = []
            lens = []
            for wav, mel_len, n in chunks:
                wav_h, len_h = jax.device_get((wav, mel_len))
                wav_h = self._host_wav(wav_h, pcm16)[:n]
                len_h = np.asarray(len_h)[:n]
                wavs.extend(self._trim(wav_h, len_h, trim))
                lens.append(len_h)
            return wavs, np.concatenate(lens)

        return fetch

    def synthesize(self, src_seq, puncts, style_embed, num_phonemes=None,
                   trim: bool = True, single_rtt: Optional[bool] = None,
                   pcm16: bool = False) -> Tuple[List[np.ndarray], np.ndarray]:
        del single_rtt       # the TP path is always a single-fetch dispatch
        return self.synthesize_async(src_seq, puncts, style_embed,
                                     num_phonemes=num_phonemes,
                                     trim=trim, pcm16=pcm16)()

    def synthesize_packed(self, src_seq, puncts, style_embed,
                          num_phonemes=None, trim: bool = True,
                          pcm16: bool = False):
        """No mel buckets under TP (module docstring) — packing degenerates
        to the ladder-padded dispatch."""
        return self.synthesize(src_seq, puncts, style_embed,
                               num_phonemes=num_phonemes,
                               trim=trim, pcm16=pcm16)
