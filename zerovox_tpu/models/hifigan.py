"""HiFi-GAN vocoder (TPU-native) — the hot graph (~90% of pipeline FLOPs).

Reference: /root/reference/src/hifigan.cpp — mel normalisation (:242-243),
input conv k=7, four [leaky(0.1) -> ConvTranspose1d -> multi-receptive-field
resblock sum / n] stages (:269-316), leaky(0.01) -> output conv -> tanh
(:318-345).  The reference hand-rolls the transposed conv with zero-stuffing
views (:22-71); here it is a single lhs-dilated XLA conv (see
zerovox_tpu.ops.conv.conv_transpose1d) feeding the MXU directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ZeroVoxConfig
from ..ops import conv1d, conv_transpose1d, leaky_relu
from ..ops.conv import (conv1d_folded, conv1d_folded_out_contract,
                        conv_transpose1d_grouped, fold, transpose_out_len,
                        unfold)
from ..ops.pallas.folded_mrf import folded_mrf_stage
from ..utils.debug import tap


def receptive_field_frames(cfg: ZeroVoxConfig) -> int:
    """Right-side halo, in mel frames, beyond which truncating the mel cannot
    change earlier output samples.

    Used by the serving engine to pick a vocoder bucket that reproduces the
    full-length run bit-exactly on the trimmed region, and as the floor for
    the streaming overlap.  Computed conservatively: ConvTranspose(stride s,
    kernel k) maps an input halo h to s*h + k output samples; an MRF stage's
    parallel resblocks contribute the max over resblocks of the summed
    (dilated + unit) conv halos.
    """
    k_half = (cfg.hifigan_kernel_size - 1) // 2
    rk_half = (cfg.resblock_kernel_size - 1) // 2
    mrf = max(sum(d * rk_half + rk_half for d in dil)
              for dil in cfg.resblock_dilations)
    h = k_half  # input conv, mel resolution
    for scale, k in zip(cfg.upsample_scales, cfg.upsample_kernel_sizes):
        h = h * scale + k + mrf
    h += k_half  # output conv, sample resolution
    return -(-h // cfg.hop_size)


def residual_block(x: jnp.ndarray, p: dict, dilations, kernel_size: int,
                   rho: int = 1) -> jnp.ndarray:
    """Multi-dilation residual block (/root/reference/src/hifigan.cpp:74-185):
    per dilation d: x += conv1(leaky(x), dil=d) |> leaky |> conv2(dil=1).

    With rho > 1 the input is in folded (B, L/rho, rho*C) layout and the convs
    run as lane-dense block matmuls (see ops.conv.fold).
    """
    half_k = (kernel_size - 1) // 2
    for d_idx, dilation in enumerate(dilations):
        c1 = p["convs1"][d_idx]
        c2 = p["convs2"][d_idx]
        xt = leaky_relu(x, 0.1)
        if rho > 1:
            xt = conv1d_folded(xt, c1["w"], c1["b"],
                               padding=half_k * dilation, dilation=dilation,
                               rho=rho)
            xt = leaky_relu(xt, 0.1)
            xt = conv1d_folded(xt, c2["w"], c2["b"], padding=half_k, rho=rho)
        else:
            xt = conv1d(xt, c1["w"], c1["b"],
                        padding=half_k * dilation, dilation=dilation)
            xt = leaky_relu(xt, 0.1)
            xt = conv1d(xt, c2["w"], c2["b"], padding=half_k)
        x = x + xt
    return x


def _folded_out_rho(L: int, rho_in: int, max_lanes: int = 128) -> int:
    """Largest rho_out (multiple of rho_in, <= max_lanes) dividing L, or 0."""
    best = 0
    r = rho_in
    while r <= max_lanes:
        if L % r == 0:
            best = r
        r += rho_in
    return best if best > rho_in else 0


def _grouped_g(scale: int, c_out: int, rho_next: int, rho_prev: int,
               L_src: int, k: int, max_g: int = 16) -> int:
    """Smallest source-step group g for the grouped upsample+MRF chain.

    Conditions: k == 2*scale (under vocode's pad = s//2 + s%2 /
    outpad = s%2 convention this is exactly conv_transpose1d_grouped's
    out_len == L*stride requirement — a nonstandard upsample kernel size
    must fall back rather than trip its assert), g % rho_prev == 0
    (integer row stride over the folded input), g*scale % rho_next == 0
    (output rows regroup to whole chain rows), g*scale*c_out % 128 == 0
    (lane-dense grouped rows), and L_src % g == 0.  Returns 0 when no
    g <= max_g works (caller falls back to the polyphase + fold path).
    """
    if k != 2 * scale:
        return 0
    for g in range(rho_prev, max_g + 1, rho_prev):
        if (g * scale) % rho_next:
            continue
        if (g * scale * c_out) % 128:
            continue
        if L_src % g:
            continue
        return g
    return 0


# t_blk note: in r2 isolated per-stage sweeps showed wins that did NOT
# transfer in-pipeline (4.59 -> 5.09 with a tuned table), so the default
# stayed 512.  After the r3 in-kernel boundary handling restructured the
# DMA (edge-branch plan, no pads), larger tiles DO transfer: t_blk 2048
# (lane-width-scaled, vmem limit lifted) measured 4.24 -> 3.80 ms
# in-pipeline; 4096 is flat (3.79) and 512-vs-1024-vs-2048 = 4.24 / 3.94
# / 3.80, i.e. per-tile fixed overhead (~2.4 us/tile) was the dominant
# kernel cost, not MXU rate (f32 dots measured only 14% slower than bf16
# at equal t_blk).  The default (2048) lives in folded_mrf_stage; still:
# measure in-pipeline before touching it.


def vocode(params: dict, cfg: ZeroVoxConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, num_mels) -> waveform (B, T * hop_size)."""
    voc = params["vocoder"]
    mel = mel.astype(voc["input_conv_w"].dtype)

    # mel_x = (mel - mean) / scale   (src/hifigan.cpp:242-243)
    x = (mel - voc["mean"]) / voc["scale"]

    pad = (cfg.hifigan_kernel_size - 1) // 2
    c = conv1d(x, voc["input_conv_w"], voc["input_conv_b"], padding=pad)

    backend = cfg.vocoder_backend
    if backend == "auto":
        # measured v5e full vocoder: pallas (fused stages) vs folded-XLA vs
        # native: 4.3 / 20.7 / 33 ms; interpret-mode pallas is slow, so CPU
        # keeps the folded XLA path
        backend = "pallas" if jax.default_backend() == "tpu" else "folded"

    cur_rho = 1   # timesteps per row of c's current layout (1 = unfolded)
    act_done = False  # True when the fused stage already applied the leaky
                      # that precedes the next conv (kernel out_leaky)
    for i, scale in enumerate(cfg.upsample_scales):
        up = voc["upsamples"][i]
        C_stage = up["w"].shape[2]
        # actual ConvTranspose output length — equals L*scale only for the
        # standard K == 2*scale geometry; nonstandard kernels produce a few
        # extra samples and must not be folded on the wrong length
        L_out = transpose_out_len(c.shape[1] * cur_rho, scale,
                                  up["w"].shape[0],
                                  scale // 2 + scale % 2, scale % 2)
        # lane-dense folding for small-channel stages (C=64 -> rho 2, C=32 -> 4)
        rho = 128 // C_stage if (128 % C_stage == 0) else 1
        rho = min(rho, 8)   # diminishing returns / compile cost beyond 8
        if backend == "native" or (rho > 1 and L_out % rho != 0):
            rho = 1
        stage_blocks = [voc["blocks"][i * cfg.num_resblocks + j]
                        for j in range(cfg.num_resblocks)]
        last = i == len(cfg.upsample_scales) - 1

        g = 0
        if backend == "pallas" and C_stage <= 256 and rho * C_stage >= 128:
            # grouped chain: ONE strided conv produces g*scale-timestep rows
            # whose lane order is time order, and the fused MRF kernel
            # regroups them in VMEM — no interleave or fold relayout between
            # the upsample and its stage (the polyphase + fold path measured
            # ~1.5 ms of pure data movement per run at production geometry)
            g = _grouped_g(scale, C_stage, max(rho, 1), cur_rho,
                           c.shape[1] * cur_rho, up["w"].shape[0])
        a = g // cur_rho if g else 0
        if a > 1 and not (
                cfg.vocoder_fuse_a_upsample
                # lane slices of the a-grouped window sit at multiples of
                # rho_in*Cin — Mosaic wants lane-tile (128) alignment on
                # real TPUs (production stage 4: 2*64 = 128 ✓); interpret
                # mode has no such restriction
                and (cur_rho * up["w"].shape[1] % 128 == 0
                     or jax.default_backend() != "tpu")):
            a = 0
        if a:
            # the upsample itself runs INSIDE the MRF kernel (its
            # transpose-conv becomes n_up sliced dots on the fetched
            # PRE-upsample window, the B=1 XLA path's math) — the upsampled
            # activation never exists in HBM, removing the XLA upsample
            # conv, its bias pass, and the custom-call boundary layout
            # copies (ARCHITECTURE §3g).  a == 1 (stages 1-3): the producing
            # stage's folded layout is consumed as-is.  a > 1 (stage 4,
            # a = 2): ONE XLA row-major reshape pre-groups a source rows per
            # fetched row, and each transpose-conv delta reads a contiguous
            # row + lane slice (the a-grouped-reshape trick, conv.py:405-418)
            # — replacing the XLA strided conv AND its 1.5x-larger output
            # regroup reshape (§11 seventh finding).
            xg = c if a == 1 else c.reshape(c.shape[0], c.shape[1] // a,
                                            a * c.shape[2])
            c = folded_mrf_stage(
                xg, stage_blocks, cfg.resblock_dilations,
                cfg.resblock_kernel_size, rho,
                in_group=g * scale // max(rho, 1),
                upsample=dict(w=up["w"], stride=scale,
                              padding=scale // 2 + scale % 2,
                              output_padding=scale % 2, rho_in=cur_rho,
                              g=g,
                              in_leaky=None if act_done else 0.1),
                in_bias=up["b"],
                out_leaky=0.01 if last else 0.1)
            act_done = True
            cur_rho = rho
            continue
        if g:
            # the upsample bias is NOT added here: it rides into the MRF
            # kernel's input load (in_bias below), saving an unfused
            # whole-activation XLA add pass (~0.6 ms of the B=8 run)
            y = conv_transpose1d_grouped(
                c if act_done else leaky_relu(c, 0.1),
                up["w"], None, stride=scale,
                padding=scale // 2 + scale % 2, output_padding=scale % 2,
                rho_in=cur_rho, g=g)
            ing = g * scale // max(rho, 1)
            if ing == 3:
                # measured on v5e: the in-kernel regroup pays for ing in
                # {2, 5} but LOSES for 3 (sublane unit 16*3 rounds the halo
                # 16 -> 48 rows and the odd-factor VMEM reshape is not
                # free): stage 4 kernel 1.76 -> 1.37 ms with the regroup
                # done as one XLA row-major reshape instead (r2, t_blk 512;
                # retried r3 at t_blk 2016: B=1 flat, B=8 29.29 vs 28.88 ms
                # — the reshape stays)
                y = y.reshape(y.shape[0], -1, y.shape[-1] // ing)
                ing = 1
            c = folded_mrf_stage(y, stage_blocks, cfg.resblock_dilations,
                                 cfg.resblock_kernel_size, rho, in_group=ing,
                                 in_bias=up["b"],
                                 out_leaky=0.01 if last else 0.1)
            act_done = True
            cur_rho = rho
            continue

        if cur_rho > 1:
            c = unfold(c, cur_rho)
        if not act_done:
            c = leaky_relu(c, 0.1)
        act_done = False
        c = conv_transpose1d(
            c, up["w"], up["b"],
            stride=scale,
            padding=scale // 2 + scale % 2,
            output_padding=scale % 2)
        # Mosaic requires lane-dense (>=128-lane) chains: a sub-128 rho*C
        # (e.g. C=8 with the rho cap at 8 -> 64 lanes) passes interpret
        # mode but fails real TPU lowering ("slice shape along dimension 2
        # must be aligned to tiling (128)"), so such stages take the XLA
        # folded path — only reachable on toy geometries; every production
        # stage has rho*C in {128, 256}
        if backend == "pallas" and C_stage <= 256 and rho * C_stage >= 128:
            if rho > 1:
                c = folded_mrf_stage(
                    fold(c, rho), stage_blocks, cfg.resblock_dilations,
                    cfg.resblock_kernel_size, rho)
            else:
                c = folded_mrf_stage(c, stage_blocks, cfg.resblock_dilations,
                                     cfg.resblock_kernel_size, rho=1)
        else:
            if rho > 1:
                c = fold(c, rho)
            acc = None
            for j, blk in enumerate(stage_blocks):
                r = residual_block(c, blk, cfg.resblock_dilations[j],
                                   cfg.resblock_kernel_size, rho=rho)
                acc = r if acc is None else acc + r
            c = acc * (1.0 / cfg.num_resblocks)
        cur_rho = rho
    last_rho = cur_rho

    B = c.shape[0]
    wav_len = mel.shape[1] * cfg.hop_size
    out_w, out_b = voc["output_conv_w"], voc["output_conv_b"]
    # the folded tail assumes the stages produced exactly wav_len samples;
    # nonstandard upsample kernels (K != 2*scale) emit a few extra and must
    # take the plain path, which crops below
    rho_out = (_folded_out_rho(wav_len, last_rho)
               if (last_rho > 1 and out_w.shape[2] == 1
                   and c.shape[1] * last_rho == wav_len) else 0)
    if rho_out:
        # tail stays lane-dense: the last stage's folded activation feeds a
        # folded-output conv (Cout=1 would otherwise be a 1-lane array whose
        # every HBM pass pads 128x); final reshape to (B, L) is dense.  The
        # contracted form does it in ONE matmul — the W_delta strided-gather
        # form measured 0.81 ms (~20x roofline) at production geometry.
        if not act_done:
            c = leaky_relu(c, 0.01)
        c = conv1d_folded_out_contract(c, out_w, out_b, padding=pad,
                                       rho_in=last_rho, rho_out=rho_out)
        c = jnp.tanh(c)
        tap("dbg", c.reshape(B, wav_len, 1))
        return tap("wav", c.reshape(B, wav_len))
    if last_rho > 1:
        c = unfold(c, last_rho)
    if not act_done:
        c = leaky_relu(c, 0.01)
    c = conv1d(c, out_w, out_b, padding=pad)
    c = jnp.tanh(c)
    if c.shape[1] > wav_len:     # nonstandard upsample kernels overshoot
        c = c[:, :wav_len]
    # "dbg" mirrors the reference's permanent probe (src/hifigan.cpp:347)
    tap("dbg", c)
    return tap("wav", c[..., 0])
