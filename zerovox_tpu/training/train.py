"""Sharded training step: teacher-forced FastSpeech2 + StyleTTS + HiFi-GAN.

One pure train_step (loss -> grad -> optax update) jit-compiled over a
(data, model) mesh: batch DP on "data", Megatron-style channel TP on "model"
(see zerovox_tpu.parallel.sharding).  XLA inserts the psums over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ZeroVoxConfig
from ..models import fs2_encoder, styletts_decoder, hifigan
from ..ops import length_regulate
from ..parallel.mesh import DATA_AXIS
from ..parallel.sharding import param_partition_specs, replicated_specs
from .losses import tts_losses


class TrainBatch(NamedTuple):
    src_seq: jnp.ndarray        # (B, P) int32
    puncts: jnp.ndarray         # (B, P) int32
    style_embed: jnp.ndarray    # (B, d_model)
    num_phonemes: jnp.ndarray   # (B,) int32
    durations: jnp.ndarray      # (B, P) int32 target frames (teacher forcing)
    mel_target: jnp.ndarray     # (B, T, num_mels)
    wav_target: jnp.ndarray     # (B, T*hop)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(peak_lr: float, total_steps: int,
                     schedule: str = "constant", warmup_steps: int = 0,
                     end_scale: float = 0.1):
    """Learning-rate schedule: "constant" (optional linear warmup) or
    "cosine" (linear warmup -> cosine decay to peak*end_scale over
    total_steps).  Returns a float or an optax schedule — both are valid
    `learning_rate` values for make_optimizer."""
    if schedule not in ("constant", "cosine"):
        raise ValueError(f"unknown lr schedule {schedule!r}")
    if warmup_steps < 0:
        # optax would silently build a shifted schedule (join boundary
        # at a negative step) — wrong LR from step 0 with no error
        raise ValueError(f"warmup_steps must be >= 0 (got {warmup_steps})")
    warmup_steps = min(int(warmup_steps), max(int(total_steps) - 1, 0))
    if schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
            decay_steps=max(int(total_steps), 1),
            end_value=peak_lr * end_scale)
    if warmup_steps > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak_lr, warmup_steps),
             optax.constant_schedule(peak_lr)], [warmup_steps])
    return peak_lr


def make_optimizer(learning_rate=1e-4, weight_decay: float = 1e-2,
                   clip_norm: float = 1.0) -> optax.GradientTransformation:
    """AdamW + global-norm clip.  learning_rate may be a float or an optax
    schedule (make_lr_schedule)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(learning_rate, b1=0.9, b2=0.98, weight_decay=weight_decay),
    )


def loss_fn(params, cfg: ZeroVoxConfig, batch: TrainBatch,
            use_stft: bool = True,
            stft_resolutions=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    attn_mask = (fs2_encoder.phoneme_mask(batch.num_phonemes,
                                          batch.src_seq.shape[-1])
                 if cfg.use_attention_mask else None)
    features, log_dur = fs2_encoder.encode(
        params, cfg, batch.src_seq, batch.puncts, batch.style_embed,
        phoneme_mask=attn_mask)

    # teacher forcing: expand with ground-truth durations
    hidden, mel_len = length_regulate(features, batch.durations, cfg.max_seq_len,
                                      num_phonemes=batch.num_phonemes)
    mel = styletts_decoder.decode(params, cfg, hidden, batch.style_embed)

    T = cfg.max_seq_len
    frame = jnp.arange(T, dtype=jnp.int32)
    mel_mask = frame[None, :] < mel_len[:, None]
    pidx = jnp.arange(batch.src_seq.shape[1], dtype=jnp.int32)
    phoneme_mask = pidx[None, :] < batch.num_phonemes[:, None]

    wav_pred = wav_target = None
    if use_stft:
        # Force a differentiable vocoder path: the fused Pallas MRF kernel
        # ("auto" resolves to it on TPU) has no autodiff rule, so value_and_grad
        # through it fails on real hardware.  "folded" is XLA-only and the
        # fastest differentiable backend.
        voc_cfg = cfg if cfg.vocoder_backend in ("folded", "native") else \
            cfg.replace(vocoder_backend="folded")
        wav_pred = hifigan.vocode(params, voc_cfg, mel)
        wav_target = batch.wav_target

    losses = tts_losses(mel, batch.mel_target, mel_mask,
                        log_dur, batch.durations, phoneme_mask,
                        wav_pred, wav_target,
                        stft_resolutions=stft_resolutions)
    return losses["total"], losses


def train_step(state: TrainState, batch: TrainBatch, cfg: ZeroVoxConfig,
               optimizer: optax.GradientTransformation,
               use_stft: bool = True, stft_resolutions=None,
               accum_steps: int = 1
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step.

    accum_steps > 1 is gradient accumulation (the capability of ggml-opt's
    opt_period, /root/reference/ggml/include/ggml-opt.h:102 — there a
    counter across calls; here, TPU-idiomatically, a lax.scan over
    microbatches inside ONE jitted step, so activation memory is that of
    batch/accum_steps rows while the optimizer sees the full batch).
    Microbatch grads/losses are averaged.  Requires the leading batch dim
    divisible by accum_steps.  The per-row masked losses (mel, duration)
    make the average EXACTLY the full-batch loss; the STFT
    spectral-convergence term normalizes by a batch-global norm, so under
    accumulation it averages per-microbatch SC — the same semantics as
    ggml-opt accumulating per-call losses.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def gf(params, b):
        return grad_fn(params, cfg, b, use_stft=use_stft,
                       stft_resolutions=stft_resolutions)

    if accum_steps <= 1:
        (_, losses), grads = gf(state.params, batch)
    else:
        B = batch.src_seq.shape[0]
        if B % accum_steps:
            raise ValueError(f"batch {B} not divisible by "
                             f"accum_steps={accum_steps}")
        micro = B // accum_steps
        mb = jax.tree.map(
            lambda x: x.reshape((accum_steps, micro) + x.shape[1:]), batch)
        micro_struct = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype), mb)
        (_, l_shape), g_shape = jax.eval_shape(gf, state.params, micro_struct)
        zeros = lambda tree: jax.tree.map(            # noqa: E731
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

        def body(carry, b):
            g_acc, l_acc = carry
            (_, losses), grads = gf(state.params, TrainBatch(*b))
            return (jax.tree.map(jnp.add, g_acc, grads),
                    jax.tree.map(jnp.add, l_acc, losses)), None

        (g_sum, l_sum), _ = jax.lax.scan(body, (zeros(g_shape),
                                                zeros(l_shape)), mb)
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * jnp.asarray(inv, g.dtype), g_sum)
        losses = jax.tree.map(lambda l: l * jnp.asarray(inv, l.dtype), l_sum)

    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), losses


def _batch_shardings(mesh: Mesh):
    """TrainBatch tree of data-axis shardings (batch DP)."""
    return jax.tree.map(lambda _: NamedSharding(mesh, P(DATA_AXIS)),
                        TrainBatch(*([0] * len(TrainBatch._fields))))


def make_sharded_train_step(cfg: ZeroVoxConfig, mesh: Mesh, params,
                            optimizer: Optional[optax.GradientTransformation] = None,
                            use_tp: bool = True, use_stft: bool = True,
                            stft_resolutions=None, accum_steps: int = 1):
    """Build (init_state, jitted_step) with dp/tp shardings on `mesh`.

    Returns (state, step_fn); state params/opt_state live sharded on the mesh,
    batches are expected sharded on the data axis (parallel.shard_batch).
    accum_steps > 1 splits each step's batch into that many scanned
    microbatches (gradient accumulation — batch/accum_steps activation
    memory; each microbatch must still divide the data axis).
    """
    optimizer = optimizer or make_optimizer()
    p_specs = (param_partition_specs(params, cfg) if use_tp
               else replicated_specs(params))

    def sh(spec):
        return NamedSharding(mesh, spec)

    params = jax.tree.map(lambda x, s: jax.device_put(x, sh(s)), params, p_specs)
    opt_state = optimizer.init(params)

    # moments inherit the param shardings (zeros_like of sharded leaves),
    # but optax's scalar leaves (count, ...) land uncommitted on one device;
    # pin them mesh-replicated so the whole TrainState carries explicit
    # shardings — orbax restore commits arrays to their target's placement,
    # and a single-device count next to mesh-sharded params is an
    # incompatible-devices error on the first resumed step
    def _pin(x):
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            return x
        return jax.device_put(x, sh(P()))

    opt_state = jax.tree.map(_pin, opt_state)
    state = TrainState(params, opt_state,
                       jax.device_put(jnp.zeros((), jnp.int32), sh(P())))

    batch_sharding = _batch_shardings(mesh)

    step = jax.jit(
        partial(train_step, cfg=cfg, optimizer=optimizer, use_stft=use_stft,
                stft_resolutions=stft_resolutions, accum_steps=accum_steps),
        in_shardings=(None, batch_sharding),
    )
    return state, step
