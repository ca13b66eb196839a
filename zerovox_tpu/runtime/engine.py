"""Serving engine: compile-cache, mel-length bucketing, batched synthesis.

The reference pays for the full max_seq_len (1500-frame / 18.75 s) graph on
every utterance regardless of actual length (/root/reference/src/zerovox.cpp:369
writes the padded tail into the WAV).  Serving on TPU wants static shapes but
not always the *largest* shape: the engine runs the encoder + length-regulator
+ StyleTTS decoder at full length first (the decoder's InstanceNorms reduce
over the whole time axis, so it MUST see the same padded buffer as the
reference — see docs/ARCHITECTURE.md), reads the predicted mel length, and
dispatches only the heavy vocoder (~90% of FLOPs) at the smallest pre-compiled
bucket that fits.  A receptive-field margin past mel_len makes the trimmed
audio bit-identical to the full-length run.  Buckets bound XLA recompiles to
len(mel_buckets) programs, compiled lazily (or all at once via warmup()).

Multi-chip serving: pass `mesh=` (a pure-DP jax.sharding.Mesh) and every
front/vocoder program runs inside shard_map over the data axis — each chip
executes the complete local pipeline on its batch slice with zero
collectives, and the batch ladder scales by the data size so dispatches
always split evenly.  See docs/ARCHITECTURE.md §6.
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
                 precision: str = "float32",
                 batch_ladder: Sequence[int] = (1, 2, 4, 8),
                 mesh=None):
        if precision not in ("float32", "bfloat16"):
            raise ValueError(f"unknown precision {precision!r}")
        if precision == "bfloat16":
            params = cast_params(params, jnp.bfloat16)
            cfg = cfg.replace(compute_dtype="bfloat16")
        # mesh: pure-DP multi-chip serving.  The front and every vocoder
        # program run inside shard_map over the mesh's data axis — each
        # chip executes the complete local pipeline (fused Pallas kernels
        # included; no GSPMD partitioning rule needed) on its batch slice
        # with ZERO collectives, so a full ladder-top dispatch costs one
        # chip's B = top/n_data wall time.  TP serving belongs to
        # parallel.make_sharded_synthesize; the engine enforces model == 1.
        self.mesh = mesh
        self._n_data = 1
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
            if mesh.shape.get(MODEL_AXIS, 1) != 1:
                raise ValueError(
                    "TTSEngine serves pure-DP meshes (model axis == 1); use "
                    "parallel.make_sharded_synthesize for TP inference")
            self._n_data = mesh.shape[DATA_AXIS]
        # the original (unplaced) tree: StreamingSynthesizer and other
        # single-device consumers must not inherit the mesh placement
        self.host_params = params
        if mesh is not None:
            from jax.sharding import NamedSharding
            from ..parallel.sharding import replicated_specs
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                params, replicated_specs(params))
        self.params = params
        self.cfg = cfg
        # Truncating the mel at `bucket` only perturbs vocoder outputs within
        # the receptive field of the cut; keeping mel_len + margin <= bucket
        # makes the trimmed waveform equal to the full run's.
        self.margin = hifigan.receptive_field_frames(cfg)
        # buckets are mel-frame capacities, always ending at max_seq_len
        bks = sorted(set(int(b) for b in mel_buckets if b < cfg.max_seq_len))
        self.mel_buckets: Tuple[int, ...] = tuple(bks) + (cfg.max_seq_len,)
        # synthesize_packed pads each bucket group to the smallest ladder
        # size that fits (splitting groups larger than the ladder top), so
        # the vocoder compile-key set is bounded at
        # len(mel_buckets) x len(batch_ladder) and warmup() can cover it —
        # group sizes are data-dependent and would otherwise each be a
        # fresh XLA program (a multi-minute first-compile on the tunnel).
        if not batch_ladder:
            raise ValueError("batch_ladder must be non-empty")
        self.batch_ladder: Tuple[int, ...] = tuple(sorted(set(
            int(b) for b in batch_ladder)))
        if self._n_data > 1:
            # every dispatch must split evenly over the data axis: scale
            # the ladder so each rung is a whole number of rows per chip
            # (a B=1 request pads to n_data rows but runs in one chip's
            # B=1 wall time — the padding rows ride the other chips)
            self.batch_ladder = tuple(s * self._n_data
                                      for s in self.batch_ladder)

        cfg_ = cfg

        def front(params, src_seq, puncts, style_embed, num_phonemes):
            mask = (fs2_encoder.phoneme_mask(num_phonemes, src_seq.shape[-1])
                    if cfg_.use_attention_mask else None)
            features, log_dur = fs2_encoder.encode(
                params, cfg_, src_seq, puncts, style_embed, phoneme_mask=mask)
            durations = durations_from_log(log_dur, cfg_.max_seq_len)
            hidden, mel_len = length_regulate(
                features, durations, cfg_.max_seq_len, num_phonemes=num_phonemes)
            # The decoder runs at FULL max_seq_len: its InstanceNorms (and the
            # asr_res IN) reduce over the entire padded time axis, so any
            # truncation here would change the statistics and diverge from the
            # reference (/root/reference/src/stylettsdec.cpp:382-449 always
            # sees the padded buffer).  It is a small share of total FLOPs.
            mel = styletts_decoder.decode(params, cfg_, hidden, style_embed)
            return mel, mel_len

        self._front = jax.jit(self._shard_over_data(
            front, n_batch_args=4, n_outs=2))
        self._back: Dict[int, callable] = {}
        # engines are shared across serving threads; guard the compile cache
        self._lock = threading.Lock()

    def _shard_over_data(self, fn, n_batch_args: int, n_outs: int):
        """Identity without a mesh; with one, shard_map `fn` over the data
        axis: params replicated, every batch arg/output split on axis 0.
        Each shard runs the complete local program (the fused Pallas
        kernels need no GSPMD partitioning rule this way) — the engine's
        ladder guarantees batch % n_data == 0."""
        if self.mesh is None:
            return fn
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        rep = jax.tree.map(lambda _: P(), self.params)
        data = P(DATA_AXIS)
        outs = (data,) * n_outs if n_outs > 1 else data
        return jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(rep,) + (data,) * n_batch_args,
            out_specs=outs,
            check_vma=False,   # pallas_call has no varying-mesh-axes rule
        )

    def _back_fn(self, bucket: int, pcm16: bool = False):
        """Vocoder program specialised to `bucket` mel frames.

        pcm16=True appends the WAV quantisation ON DEVICE (clip to [-1,1],
        scale, truncate-toward-zero — numerically identical to
        io.wav.float_to_pcm16) so the host fetch moves int16: the fetch of
        a fresh 450k-sample waveform through the tunnel measured 98.5 ms
        p50 as f32 vs 75.3 ms as int16 — the transfer, not the compute,
        dominates one-shot serving latency."""
        key = (bucket, pcm16)
        with self._lock:
            if key not in self._back:
                cfg_ = self.cfg

                def back(params, mel_b):
                    wav = hifigan.vocode(params, cfg_, mel_b)
                    if pcm16:
                        from ..io.wav import float_to_pcm16_device
                        wav = float_to_pcm16_device(wav)
                    return wav

                self._back[key] = jax.jit(self._shard_over_data(
                    back, n_batch_args=1, n_outs=1))
            return self._back[key]

    def _data_sharded(self, x):
        """Mesh mode: pin x to the data-axis sharding the jitted programs
        were compiled under (warmup's layout).  Regrouped/gathered mels
        (jnp.take across shards) otherwise carry a different input
        sharding, and jit keys on sharding — a fresh compile for a shape
        warmup already covered (the multi-minute tunnel stall the ladder
        exists to prevent)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        # P(DATA_AXIS), not P(DATA_AXIS, None, ...): the specs compare
        # unequal as jit cache keys even though they shard identically,
        # and shard_map outputs carry the short form
        return jax.device_put(x, NamedSharding(self.mesh, P(DATA_AXIS)))

    def pick_bucket(self, mel_len: int) -> int:
        """Smallest bucket covering mel_len + the vocoder receptive field."""
        need = min(int(mel_len) + self.margin, self.cfg.max_seq_len)
        for b in self.mel_buckets:
            if need <= b:
                return b
        return self.mel_buckets[-1]

    def ladder_size(self, n: int) -> int:
        """Smallest ladder batch covering n (capped at the ladder top)."""
        for s in self.batch_ladder:
            if n <= s:
                return s
        return self.batch_ladder[-1]

    def _ladder_chunks(self, idxs: Sequence[int]):
        """Split an index list into ladder-top chunks, each padded (first
        index repeated) up to its ladder size.  Yields (padded_idxs, n_real)
        — the one shape-bounding rule every batched dispatch (front,
        vocoder, packed groups) shares."""
        top = self.batch_ladder[-1]
        for c0 in range(0, len(idxs), top):
            chunk = list(idxs[c0:c0 + top])
            size = self.ladder_size(len(chunk))
            yield chunk + [chunk[0]] * (size - len(chunk)), len(chunk)

    def warmup(self, batch: int = 1, pcm16: bool = False):
        """Compile every program serving can hit for batches up to `batch`:
        the front and the vocoder (at each bucket) at every ladder size
        <= ladder_size(batch).  Both paths only ever run at ladder sizes
        (_dispatch_front pads/splits to the ladder), so this covers ALL
        request batch sizes once batch >= the ladder top.
        pcm16=True additionally warms the int16-output variants.

        Every program's output is FETCHED before warmup returns: through
        the axon tunnel, compiles run asynchronously and dispatches
        queue, so a dispatch-only warmup returns with minutes of backlog
        still in flight and the first real request eats it (observed:
        the daemon's priming /synthesize timing out at 300 s on every
        fresh start).  jax.block_until_ready does not synchronize
        through the tunnel; a device_get does."""
        cfg = self.cfg
        sizes = sorted(s for s in self.batch_ladder
                       if s <= self.ladder_size(batch))
        variants = (False, True) if pcm16 else (False,)
        # dispatch EVERY program before fetching ANY: the tunnel's
        # compiles are asynchronous, so this puts all of them in flight
        # at once and the single fetch waits for the slowest instead of
        # paying the per-ladder-size sum
        outs = []
        for s in sizes:
            src = jnp.zeros((s, cfg.max_n_phonemes), jnp.int32)
            style = jnp.zeros((s, cfg.d_model), jnp.float32)
            mel, mel_len = self._front(self.params, src, src, style,
                                       jnp.zeros((s,), jnp.int32))
            outs.append(mel_len)
            for b in self.mel_buckets:
                for v in variants:
                    outs.append(self._back_fn(b, v)(self.params, mel[:, :b]))
        jax.device_get(outs)

    def reload_params(self, params):
        """Hot-swap model weights; every compiled program stays valid.

        The jitted front/vocoder programs take params as an ARGUMENT, so
        swapping weights of identical pytree structure/shapes/dtypes
        re-keys nothing: no XLA recompile, no warmup, no restart — a
        model update costs one host->device transfer instead of the
        daemon-restart path (which even with the persistent compile
        cache pays process startup + executable loads).  Geometry
        changes must go through a restart; they are rejected here.
        """
        if self.cfg.compute_dtype == "bfloat16":
            params = cast_params(params, jnp.bfloat16)
        self._validate_same_geometry(self.host_params, params)
        self.host_params = params
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from ..parallel.sharding import replicated_specs
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                params, replicated_specs(params))
        # atomic reference swap (CPython): in-flight calls finish on the
        # old tree; subsequent dispatches read the new one
        self.params = params

    @staticmethod
    def _validate_same_geometry(old_params, new_params):
        """Raise ValueError unless new_params has the exact pytree
        structure and per-leaf shapes/dtypes of old_params (the condition
        for a hot reload to re-key nothing)."""
        if jax.tree.structure(old_params) != jax.tree.structure(new_params):
            raise ValueError("checkpoint parameter tree differs from the "
                             "loaded model's — geometry changed, restart "
                             "required")
        old = jax.tree_util.tree_flatten_with_path(old_params)[0]
        try:
            new = jax.tree_util.tree_flatten_with_path(new_params)[0]
            mismatches = [
                (jax.tree_util.keystr(kp),
                 tuple(a.shape), str(a.dtype), tuple(b.shape), str(b.dtype))
                for (kp, a), (_, b) in zip(old, new)
                if tuple(a.shape) != tuple(b.shape) or
                np.dtype(a.dtype) != np.dtype(b.dtype)]
        except (TypeError, AttributeError) as e:
            raise ValueError(f"incompatible checkpoint structure: {e}")
        if mismatches:
            raise ValueError(
                "checkpoint geometry mismatch (restart required): "
                + "; ".join(f"{k}: {bs}/{bd} vs engine {as_}/{ad}"
                            for k, as_, ad, bs, bd in mismatches[:3]))

    # ------------------------------------------------------------------ API
    def synthesize(self, src_seq, puncts, style_embed,
                   num_phonemes=None, trim: bool = True,
                   single_rtt: Optional[bool] = None,
                   pcm16: bool = False
                   ) -> Tuple[List[np.ndarray], np.ndarray]:
        """Batched synthesis with bucket dispatch.

        Returns (list of per-utterance waveforms (trimmed to mel_len*hop when
        trim=True), mel_len array).

        single_rtt (default: on for B == 1) dispatches the max-bucket vocoder
        speculatively BEFORE fetching mel_len and fetches wav + mel_len in one
        device_get — one ~30 ms tunnel round trip instead of two.  The max
        bucket always covers the true length, so speculation never rolls
        back; it just skips the bucket compute saving, which at B=1 is ~5 ms
        against the ~30 ms RTT it removes (the streaming TTFA trick,
        models/streaming.py).  single_rtt=True delegates to
        synthesize_async()+fetch: any batch size works (ladder chunks are
        all dispatched before the first fetch blocks — compile keys stay
        bounded).  With single_rtt off, the whole batch vocodes at
        the bucket of its longest utterance; for mixed-length batches use
        synthesize_packed(), which routes each bucket group separately.
        """
        B0 = int(np.shape(src_seq)[0])   # no device transfer just for shape
        if B0 == 0:
            raise ValueError("empty batch")
        if single_rtt is None:
            single_rtt = B0 == 1
        if single_rtt:
            return self.synthesize_async(src_seq, puncts, style_embed,
                                         num_phonemes=num_phonemes,
                                         trim=trim, pcm16=pcm16)()

        mel, mel_len_h = self._run_front(
            src_seq, puncts, style_embed, num_phonemes)
        # trim=False promises the reference's FULL padded buffer (whose tail
        # is bias-propagated, not zero), so it must vocode at the max
        # bucket on every path — otherwise this branch would return a
        # bucket-length array while the single-RTT branch above returns
        # max_seq_len*hop for the same inputs
        # B >= 1 here: _dispatch_front rejects empty batches
        bucket = (self.pick_bucket(int(mel_len_h.max()))
                  if trim else self.mel_buckets[-1])

        wav_h = self._vocode_ladder(mel, bucket, pcm16)
        return self._trim(wav_h, mel_len_h, trim), mel_len_h

    def synthesize_async(self, src_seq, puncts, style_embed,
                         num_phonemes=None, trim: bool = True,
                         pcm16: bool = False):
        """Dispatch synthesis WITHOUT blocking; returns a fetch() closure.

        The B=1 single-RTT trick generalized into a dispatch/fetch split:
        the front and a speculative MAX-BUCKET vocoder are enqueued with
        zero host syncs (the max bucket always covers the true mel length,
        so speculation never rolls back — it only skips the bucket compute
        saving, a few ms of MXU time against the ~30 ms round trip each
        sync would cost), and fetch() collects wav + mel_len in ONE
        device_get per ladder chunk, trimming on host.

        Because dispatch returns immediately, a caller (the DynamicBatcher's
        dispatcher thread) can enqueue batch k+1 while batch k's device
        compute and host fetch are still in flight — measured on the chip:
        4 B=8 full-bucket rounds take 845 ms serially (dispatch->fetch->
        dispatch) vs 583 ms with dispatches enqueued eagerly and fetches
        overlapped on threads (scripts/measure_packed_phases.py).

        Batches larger than the ladder top split into ladder chunks, all
        dispatched before fetch() blocks on any of them.  Compile keys are
        the warmup() set (ladder fronts + max-bucket vocoders).
        """
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
        bucket = self.mel_buckets[-1]
        back = self._back_fn(bucket, pcm16)
        chunks = []
        for padded, n in self._ladder_chunks(range(B0)):
            if padded == list(range(B0)):          # fast path: no shuffle
                s, p, st, np_ = src, pun, sty, nph
            else:
                idx = jnp.asarray(padded, jnp.int32)
                s, p, st, np_ = (jnp.take(a, idx, axis=0)
                                 for a in (src, pun, sty, nph))
            mel, mel_len = self._front(self.params, s, p, st, np_)
            wav = back(self.params, self._data_sharded(mel[:, :bucket]))
            chunks.append((wav, mel_len, n))

        def fetch() -> Tuple[List[np.ndarray], np.ndarray]:
            wavs: List[np.ndarray] = []
            lens = []
            for wav, mel_len, n in chunks:
                wav_h, len_h = jax.device_get((wav, mel_len))  # ONE fetch
                wav_h = self._host_wav(wav_h, pcm16)[:n]
                len_h = np.asarray(len_h)[:n]
                wavs.extend(self._trim(wav_h, len_h, trim))
                lens.append(len_h)
            return wavs, np.concatenate(lens)

        return fetch

    def synthesize_packed(self, src_seq, puncts, style_embed,
                          num_phonemes=None, trim: bool = True,
                          pcm16: bool = False
                          ) -> Tuple[List[np.ndarray], np.ndarray]:
        """Bucket-packed batched synthesis.

        Splits the batch by per-utterance bucket (group_by_bucket) and runs
        one vocoder dispatch per group, so short utterances in a mixed batch
        do not pay the longest utterance's compute.  Outputs are identical to
        synthesize() (both match the full-length run on the trimmed region).

        Group sizes are data-dependent, so each group is padded (rows
        repeated) up to the engine's batch_ladder — and split into
        ladder-top chunks first when larger — keeping the vocoder
        compile-key set bounded at len(mel_buckets) x len(batch_ladder),
        all of which warmup() pre-compiles.

        All group dispatches are enqueued BEFORE the first wav fetch: each
        jnp.take depends only on the already-resident mel, so fetching
        inside the dispatch loop would serialize k groups into k tunnel
        round trips with zero compute/transfer overlap (the same pattern
        warmup() and synthesize_async avoid — docs/ARCHITECTURE §13).
        """
        mel, mel_len_h = self._run_front(
            src_seq, puncts, style_embed, num_phonemes)
        B = mel.shape[0]
        cfg = self.cfg
        wavs: List[Optional[np.ndarray]] = [None] * B
        groups = (self.group_by_bucket(mel_len_h) if trim
                  else {self.mel_buckets[-1]: list(range(B))})
        pending = []                     # dispatch every group first...
        for bucket, idxs in groups.items():
            for padded, n in self._ladder_chunks(idxs):
                mel_g = jnp.take(mel, jnp.asarray(padded, jnp.int32), axis=0)
                wav = self._back_fn(bucket, pcm16)(
                    self.params, self._data_sharded(mel_g[:, :bucket]))
                pending.append((wav, padded, n))
        for wav, padded, n in pending:   # ...then pay the fetch RTTs
            wav_h = self._host_wav(jax.device_get(wav), pcm16)
            for k, i in enumerate(padded[:n]):
                w = wav_h[k]
                if trim:
                    w = w[: int(mel_len_h[i]) * cfg.hop_size]
                wavs[i] = w
        return wavs, mel_len_h

    # ---------------------------------------------------------------- helpers
    def _dispatch_front(self, src_seq, puncts, style_embed, num_phonemes):
        """Dispatch the front program; returns DEVICE (mel, mel_len) with no
        host fetch (the single-RTT path fetches mel_len with the wav).

        The raw batch is padded (rows repeated) up to the engine's
        batch_ladder — and split into ladder-top chunks first when larger —
        exactly like the vocoder groups in synthesize_packed: a request with
        an arbitrary utterance count must never mint a fresh front XLA
        program (a multi-minute first-compile on the tunnel).  Front compile
        keys are therefore bounded at len(batch_ladder), all covered by
        warmup()."""
        cfg = self.cfg
        src_seq = jnp.asarray(src_seq, jnp.int32)
        puncts = jnp.asarray(puncts, jnp.int32)
        style_embed = jnp.asarray(style_embed, jnp.float32)
        B = src_seq.shape[0]
        if B == 0:
            raise ValueError("empty batch")
        if num_phonemes is None:
            num_phonemes = jnp.full((B,), cfg.max_n_phonemes, jnp.int32)
        else:
            num_phonemes = jnp.asarray(num_phonemes, jnp.int32)
        if B in self.batch_ladder:            # fast path: no index shuffle
            return self._front(self.params, src_seq, puncts,
                               style_embed, num_phonemes)
        mels, lens = [], []
        for padded, n in self._ladder_chunks(range(B)):
            idx = jnp.asarray(padded, jnp.int32)
            mel_c, len_c = self._front(
                self.params, jnp.take(src_seq, idx, axis=0),
                jnp.take(puncts, idx, axis=0),
                jnp.take(style_embed, idx, axis=0),
                jnp.take(num_phonemes, idx, axis=0))
            mels.append(mel_c[:n])
            lens.append(len_c[:n])
        if len(mels) == 1:
            return mels[0], lens[0]
        return jnp.concatenate(mels, axis=0), jnp.concatenate(lens, axis=0)

    def _run_front(self, src_seq, puncts, style_embed, num_phonemes):
        mel, mel_len = self._dispatch_front(
            src_seq, puncts, style_embed, num_phonemes)
        mel_len_h = np.asarray(jax.device_get(mel_len))
        return mel, mel_len_h

    def _vocode_ladder(self, mel, bucket: int, pcm16: bool) -> np.ndarray:
        """Vocoder dispatch at `bucket` with ladder-bounded batch compile
        keys: the device mel batch is split into ladder-top chunks and each
        padded (rows repeated) to a ladder size, like the groups in
        synthesize_packed.  Returns the host waveform for the original
        batch."""
        B = mel.shape[0]
        if B in self.batch_ladder:             # fast path: no index shuffle
            wav = self._back_fn(bucket, pcm16)(
                self.params, self._data_sharded(mel[:, :bucket]))
            return self._host_wav(jax.device_get(wav), pcm16)
        outs = []
        for padded, n in self._ladder_chunks(range(B)):
            mel_g = jnp.take(mel, jnp.asarray(padded, jnp.int32), axis=0)
            wav = self._back_fn(bucket, pcm16)(
                self.params, self._data_sharded(mel_g[:, :bucket]))
            outs.append(self._host_wav(jax.device_get(wav), pcm16)[:n])
        return np.concatenate(outs, axis=0)

    @staticmethod
    def _host_wav(wav_h, pcm16: bool) -> np.ndarray:
        """Fetched waveform as numpy: int16 passes through (device-quantised),
        the float path is widened to f32 for callers (bf16 serving)."""
        wav_h = np.asarray(wav_h)
        return wav_h if pcm16 else wav_h.astype(np.float32)

    def _trim(self, wav_h: np.ndarray, mel_len_h: np.ndarray, trim: bool
              ) -> List[np.ndarray]:
        B = wav_h.shape[0]
        if not trim:
            return [wav_h[i] for i in range(B)]
        hop = self.cfg.hop_size
        return [wav_h[i, : int(mel_len_h[i]) * hop] for i in range(B)]

    def group_by_bucket(self, predicted_lens: Sequence[int]) -> Dict[int, List[int]]:
        """Group utterance indices by their mel bucket (for batch packing)."""
        groups: Dict[int, List[int]] = {}
        for i, L in enumerate(predicted_lens):
            groups.setdefault(self.pick_bucket(int(L)), []).append(i)
        return groups
