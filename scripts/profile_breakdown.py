"""Per-segment device-time breakdown of the synthesis pipeline on real TPU.

Times each piece of the pipeline in isolation (encoder+LR+decoder, vocoder
input conv, every upsample, every MRF stage, output tail) with
utils.profiling.device_time, then compares the sum against the full fused
pipeline.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_breakdown.py

Segments are timed on randomly-initialised tensors of the production shapes
(time is shape-dependent, not value-dependent).  The reference has no
per-stage profiler at all (SURVEY §5: printf sums only).
"""

from __future__ import annotations

import sys
from functools import partial

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cumulative(cfg, params, mel):
    """Time vocoder prefixes P0..P9 (each jitted whole); diffs localize
    composition overhead that per-segment isolation hides."""
    import jax.numpy as jnp
    from zerovox_tpu.models import hifigan
    from zerovox_tpu.ops import conv1d, conv_transpose1d, leaky_relu
    from zerovox_tpu.ops.conv import fold, conv1d_folded_out_contract
    from zerovox_tpu.ops.pallas.folded_mrf import folded_mrf_stage
    from zerovox_tpu.utils.profiling import device_time

    pad = (cfg.hifigan_kernel_size - 1) // 2

    def prefix(n_steps):
        def fn(p, m):
            voc = p["vocoder"]
            x = (m - voc["mean"]) / voc["scale"]
            c = conv1d(x, voc["input_conv_w"], voc["input_conv_b"], padding=pad)
            step = 1
            rho = 1
            for i, scale in enumerate(cfg.upsample_scales):
                if step >= n_steps:
                    return c
                up = voc["upsamples"][i]
                c = conv_transpose1d(leaky_relu(c, 0.1), up["w"], up["b"],
                                     stride=scale,
                                     padding=scale // 2 + scale % 2,
                                     output_padding=scale % 2)
                step += 1
                if step >= n_steps:
                    return c
                C = c.shape[-1]
                rho = 128 // C if (128 % C == 0 and c.shape[1] % (128 // C) == 0) else 1
                blocks = [voc["blocks"][i * cfg.num_resblocks + j]
                          for j in range(cfg.num_resblocks)]
                xf = fold(c, rho) if rho > 1 else c
                xf = folded_mrf_stage(xf, blocks, cfg.resblock_dilations,
                                      cfg.resblock_kernel_size, rho)
                c = xf
                if rho > 1 and i < len(cfg.upsample_scales) - 1:
                    from zerovox_tpu.ops.conv import unfold
                    c = unfold(c, rho)
                step += 1
            if step >= n_steps:
                return c
            wav_len = m.shape[1] * cfg.hop_size
            rho_out = hifigan._folded_out_rho(wav_len, rho)
            c = leaky_relu(c, 0.01)
            c = conv1d_folded_out_contract(c, voc["output_conv_w"],
                                           voc["output_conv_b"], padding=pad,
                                           rho_in=rho, rho_out=rho_out)
            return jnp.tanh(c)
        return fn

    names = ["in_conv", "up0", "mrf0", "up1", "mrf1", "up2", "mrf2",
             "up3", "mrf3", "tail"]
    prev = 0.0
    for n in range(1, 11):
        t = device_time(prefix(n), params, mel, iters=10, reps=3)
        print(f"P{n:<2d} (+{names[n-1]:8s}) {t*1e3:8.3f} ms   "
              f"delta {1e3*(t-prev):+7.3f} ms", flush=True)
        prev = t


def main():
    import argparse
    import jax
    import jax.numpy as jnp

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.models import fs2_encoder, styletts_decoder, hifigan
    from zerovox_tpu.models.pipeline import synthesize, cast_params
    from zerovox_tpu.ops import (conv1d, conv_transpose1d, durations_from_log,
                                 leaky_relu, length_regulate)
    from zerovox_tpu.ops.conv import conv1d_folded_out, fold
    from zerovox_tpu.params import init_params
    from zerovox_tpu.utils.profiling import device_time

    ap = argparse.ArgumentParser()
    ap.add_argument("--cumulative", action="store_true",
                    help="time vocoder prefixes to localize composition overhead")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    cfg = ZeroVoxConfig(compute_dtype="bfloat16")
    params = cast_params(init_params(cfg, seed=0), jnp.bfloat16)
    dt = jnp.bfloat16
    B = args.batch
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, cfg.num_phonemes + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    pun = jnp.asarray(rng.integers(0, cfg.num_puncts + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    style = jnp.asarray(rng.normal(scale=0.1, size=(B, cfg.d_model)), jnp.float32)

    print(f"devices={jax.devices()}", file=sys.stderr, flush=True)

    if args.cumulative:
        mel = jnp.asarray(rng.normal(size=(B, cfg.max_seq_len, cfg.num_mels)), dt)
        cumulative(cfg, params, mel)
        return
    rows = []

    def bench(name, fn, *args):
        t = device_time(fn, *args, iters=10, reps=3)
        rows.append((name, t))
        print(f"{name:34s} {t*1e3:8.3f} ms", flush=True)
        return t

    # ---- full pipeline & mel production ------------------------------
    bench("full synthesize", lambda p, s, pu, se:
          synthesize(p, cfg, s, pu, se).wav, params, src, pun, style)

    def to_mel(p, s, pu, se):
        se = se.astype(dt)
        feats, log_dur = fs2_encoder.encode(p, cfg, s, pu, se)
        dur = durations_from_log(log_dur, cfg.max_seq_len)
        hidden, _ = length_regulate(feats, dur, cfg.max_seq_len)
        return styletts_decoder.decode(p, cfg, hidden, se)

    bench("encoder+LR+decoder (mel)", to_mel, params, src, pun, style)

    mel = jnp.asarray(rng.normal(size=(B, cfg.max_seq_len, cfg.num_mels)), dt)
    bench("vocoder (full)", lambda p, m: hifigan.vocode(p, cfg, m), params, mel)

    # ---- vocoder segments --------------------------------------------
    voc = params["vocoder"]
    pad = (cfg.hifigan_kernel_size - 1) // 2

    def in_conv(p, m):
        x = (m - p["vocoder"]["mean"]) / p["vocoder"]["scale"]
        return conv1d(x, p["vocoder"]["input_conv_w"],
                      p["vocoder"]["input_conv_b"], padding=pad)

    bench("  mel-norm + input conv", in_conv, params, mel)

    # per-stage shapes
    L = cfg.max_seq_len
    C = voc["input_conv_w"].shape[2]
    for i, scale in enumerate(cfg.upsample_scales):
        up = voc["upsamples"][i]
        Cout = up["w"].shape[2]
        x_in = jnp.asarray(rng.normal(size=(B, L, C)), dt)

        def ups(p, x, i=i, scale=scale):
            u = p["vocoder"]["upsamples"][i]
            return conv_transpose1d(
                leaky_relu(x, 0.1), u["w"], u["b"], stride=scale,
                padding=scale // 2 + scale % 2, output_padding=scale % 2)

        bench(f"  upsample{i} {C}->{Cout} (L={L})", ups, params, x_in)
        L, C = L * scale, Cout

        rho = 128 // C if (128 % C == 0) else 1
        rho = min(rho, 8)
        if L % rho:
            rho = 1
        xs = jnp.asarray(rng.normal(size=(B, L // rho, rho * C)), dt)

        def mrf(p, xf, i=i, rho=rho):
            from zerovox_tpu.ops.pallas.folded_mrf import folded_mrf_stage
            blocks = [p["vocoder"]["blocks"][i * cfg.num_resblocks + j]
                      for j in range(cfg.num_resblocks)]
            return folded_mrf_stage(xf, blocks, cfg.resblock_dilations,
                                    cfg.resblock_kernel_size, rho)

        bench(f"  MRF stage{i} C={C} rho={rho} (L={L})", mrf, params, xs)

    last_rho = 128 // C
    xs = jnp.asarray(rng.normal(size=(B, L // last_rho, 128)), dt)
    rho_out = hifigan._folded_out_rho(L, last_rho)

    def tail(p, xf):
        c = leaky_relu(xf, 0.01)
        c = conv1d_folded_out(c, p["vocoder"]["output_conv_w"],
                              p["vocoder"]["output_conv_b"], padding=pad,
                              rho_in=last_rho, rho_out=rho_out)
        return jnp.tanh(c)

    bench("  output tail (folded out conv)", tail, params, xs)

    total_parts = sum(t for n, t in rows if n.startswith("  "))
    full = rows[0][1]
    print(f"\n{'sum of vocoder parts':34s} {total_parts*1e3:8.3f} ms")
    print(f"{'full - (mel + parts)':34s} "
          f"{(full - rows[1][1] - total_parts)*1e3:8.3f} ms  (fusion gain / overhead)")


if __name__ == "__main__":
    main()
