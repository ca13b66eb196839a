"""Pallas fused MRF kernel: exactness vs the XLA folded path (interpret mode
on CPU; the same kernel compiles on TPU — see docs/ARCHITECTURE.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.models.hifigan import residual_block
from zerovox_tpu.ops.conv import fold
from zerovox_tpu.ops.pallas.folded_mrf import (folded_mrf_stage, _stage_halo,
                                               _conv_schedule)
from zerovox_tpu.params import init_params

CFG = TINY_CONFIG


def _stage(params, stage, xf, rho):
    blocks = [params["vocoder"]["blocks"][stage * CFG.num_resblocks + j]
              for j in range(CFG.num_resblocks)]
    acc = None
    for j, blk in enumerate(blocks):
        r = residual_block(xf, blk, CFG.resblock_dilations[j],
                           CFG.resblock_kernel_size, rho=rho)
        acc = r if acc is None else acc + r
    return blocks, acc / CFG.num_resblocks


@pytest.mark.parametrize("C,rho,L,t_blk", [(16, 8, 320, 16), (8, 16, 240, 8),
                                           (16, 8, 320, 32)])
def test_fused_mrf_matches_xla_folded(rng, C, rho, L, t_blk):
    params = init_params(CFG, seed=0)
    stage = {16: 0, 8: 1}[C]
    x = jnp.asarray(rng.normal(size=(2, L, C)), jnp.float32)
    xf = fold(x, rho)
    blocks, ref = _stage(params, stage, xf, rho)

    got = folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=t_blk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_halo_covers_schedules():
    """The cumulative halo must dominate every conv chain's offset span."""
    for rho in (2, 4, 8):
        h = _stage_halo(CFG.resblock_dilations, CFG.resblock_kernel_size, rho)
        per_rb = []
        for dils in CFG.resblock_dilations:
            tot = 0
            for d in dils:
                for dd in (d, 1):
                    s = _conv_schedule(CFG.resblock_kernel_size, rho, dd)
                    tot += max(-s[0], s[-1])
            per_rb.append(tot)
        assert h == max(per_rb)


def test_tail_tile_zero_padded(rng):
    """nblk not divisible by t_blk: padded tail must not corrupt output."""
    params = init_params(CFG, seed=0)
    C, rho = 16, 8
    x = jnp.asarray(rng.normal(size=(1, 312, C)), jnp.float32)  # 39 blocks
    xf = fold(x, rho)
    blocks, ref = _stage(params, 0, xf, rho)
    got = folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("nrows,t_blk,g", [
    (39, 16, 1),    # unaligned rows, multi-tile: edge-branch DMA + tail patch
    (5, 16, 1),     # rows < one sublane: tail-only tile (zero-size bulk DMA)
    (42, 16, 2),    # grouped input with unaligned grouped rows
])
def test_unaligned_rows_edge_branches(rng, nrows, t_blk, g):
    """The kernel consumes the input UNPADDED (r3): per-tile DMA branches
    clip the halo window to the array and the sub-sublane remainder rows
    arrive via the VMEM tail patch (_fetch_plan).  Any nrows % sublane != 0
    (the production T=1500 geometry is ≡ 4 mod 8) must still bit-match the
    XLA folded path."""
    params = init_params(CFG, seed=0)
    C, rho = 16, 8
    x = jnp.asarray(rng.normal(size=(1, nrows * rho, C)), jnp.float32)
    xf = fold(x, rho)
    blocks, ref = _stage(params, 0, xf, rho)
    xin = xf.reshape(1, nrows // g, g * xf.shape[-1]) if g > 1 else xf
    got = folded_mrf_stage(xin, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=t_blk,
                           in_group=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("kernels", [(11, 8, 6), (12, 8, 6)])
def test_nonstandard_upsample_kernel_falls_back(rng, kernels):
    """A checkpoint with nonstandard upsample kernels (K != 2*scale) must
    take the polyphase fallback end to end: _grouped_g rejects it, the fold
    decision uses the real ConvTranspose length, and the output tail crops
    the overshoot instead of asserting.  (11,8,6) leaves the last stage
    rho-indivisible; (12,8,6) leaves it rho-DIVISIBLE, which used to reach
    the folded tail with a mismatched wav_len (review finding r2)."""
    from zerovox_tpu.models import hifigan
    from zerovox_tpu.params import init_params as init
    cfg = CFG.replace(upsample_kernel_sizes=kernels,
                      vocoder_backend="pallas")
    assert hifigan._grouped_g(5, 16, 1, 1, 320, k=kernels[0]) == 0
    params = init(cfg, seed=0)
    mel = jnp.asarray(rng.normal(size=(1, 32, cfg.num_mels)), jnp.float32)
    wav = hifigan.vocode(params, cfg, mel)    # must not raise
    assert wav.shape[-1] <= 32 * cfg.hop_size
    assert np.isfinite(np.asarray(wav)).all()


def test_contract_mode_matches_default(rng):
    """folded_mrf_stage(contract=True) — the experimental lane-packed
    operand path — stays exact vs the W_delta default."""
    params = init_params(CFG, seed=0)
    C, rho, L = 16, 8, 320
    x = jnp.asarray(rng.normal(size=(1, L, C)), jnp.float32)
    xf = fold(x, rho)
    blocks, _ = _stage(params, 0, xf, rho)
    ref = folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=16)
    got = folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=16,
                           contract=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_out_leaky_matches_external(rng):
    """folded_mrf_stage(out_leaky=s) == leaky_relu(folded_mrf_stage(x), s)."""
    from zerovox_tpu.ops import leaky_relu
    params = init_params(CFG, seed=0)
    C, rho, L = 16, 8, 320
    x = jnp.asarray(rng.normal(size=(2, L, C)), jnp.float32)
    xf = fold(x, rho)
    blocks, _ = _stage(params, 0, xf, rho)
    ref = leaky_relu(folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                                      CFG.resblock_kernel_size, rho,
                                      t_blk=16), 0.1)
    got = folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=16,
                           out_leaky=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_vocoder_backend_pallas_matches_folded(rng):
    """End-to-end vocode() with vocoder_backend='pallas' vs 'folded'."""
    from zerovox_tpu.models import hifigan
    params = init_params(CFG, seed=0)
    mel = jnp.asarray(rng.normal(size=(1, 32, CFG.num_mels)), jnp.float32)
    ref = hifigan.vocode(params, CFG.replace(vocoder_backend="folded"), mel)
    got = hifigan.vocode(params, CFG.replace(vocoder_backend="pallas"), mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    nat = hifigan.vocode(params, CFG.replace(vocoder_backend="native"), mel)
    np.testing.assert_allclose(np.asarray(nat), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_mrf_stage_unfolded_io(rng):
    """Experimental unfolded-I/O kernel variant (interpret mode; Mosaic does
    not yet accept its in-kernel reshape on hardware)."""
    from zerovox_tpu.ops.pallas.folded_mrf import mrf_stage_unfolded
    from zerovox_tpu.ops.conv import unfold
    params = init_params(CFG, seed=0)
    C, rho, L = 16, 8, 320
    x = jnp.asarray(rng.normal(size=(1, L, C)), jnp.float32)
    xf = fold(x, rho)
    blocks, ref = _stage(params, 0, xf, rho)
    got = mrf_stage_unfolded(x, blocks, CFG.resblock_dilations,
                             CFG.resblock_kernel_size, rho, t_blk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(unfold(ref, rho)),
                               atol=2e-5, rtol=1e-4)


def test_out_leaky_bf16_ordering(rng):
    """bf16 serving path: the fused out_leaky acts on the f32 accumulator
    before the cast, the unfused path after it — drift is bounded by one
    bf16 ulp of the (slope-scaled) value (ADVICE r2; see the folded_mrf_stage
    docstring)."""
    from zerovox_tpu.ops import leaky_relu
    from zerovox_tpu.models.pipeline import cast_params
    params = cast_params(init_params(CFG, seed=0), jnp.bfloat16)
    C, rho, L = 16, 8, 320
    x = jnp.asarray(rng.normal(size=(2, L, C)), jnp.bfloat16)
    xf = fold(x, rho)
    blocks = [params["vocoder"]["blocks"][j]
              for j in range(CFG.num_resblocks)]
    ref = leaky_relu(folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                                      CFG.resblock_kernel_size, rho,
                                      t_blk=16), 0.1)
    got = folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=16,
                           out_leaky=0.1)
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    # <= 2 bf16 ulps at each element's magnitude (8 mantissa bits): one from
    # rounding the pre-slope value (slope scaling preserves relative error),
    # one from the final cast
    ulp = np.maximum(np.abs(r), np.abs(g)) * 2.0 ** -8 + 1e-9
    assert np.all(np.abs(r - g) <= 2 * ulp)


def test_phase_shift_reduces_passes():
    """The phase-shifted intermediate layout (r3) must keep its measured
    MXU-pass reduction on the production geometry (k=3, dilations 1/3/5):
    22->16 per resblock at rho=2, 20->15 at rho=4 — and never lose to
    phase 0 on any geometry the config space can produce."""
    from zerovox_tpu.ops.pallas.folded_mrf import _best_phase

    def passes(k, rho, dils, phased):
        n = 0
        for d in dils:
            phi = _best_phase(k, rho, d) if phased else 0
            n += len(_conv_schedule(k, rho, d, -phi))
            n += len(_conv_schedule(k, rho, 1, phi))
        return n

    assert passes(3, 2, (1, 3, 5), False) == 22
    assert passes(3, 2, (1, 3, 5), True) == 16
    assert passes(3, 4, (1, 3, 5), False) == 20
    assert passes(3, 4, (1, 3, 5), True) == 15
    for k in (3, 5, 7):
        for rho in (2, 4, 8, 16):
            for dils in ((1, 3, 5), (1, 3), (1, 2)):
                assert passes(k, rho, dils, True) <= passes(k, rho, dils, False)


def test_in_bias_matches_external_add(rng):
    """in_bias (the fused upsample bias, r3) must equal adding the tiled
    bias to the activation before the stage — including across tile
    boundaries, where stale halo rows pick the bias up and mask_oob must
    re-zero them."""
    params = init_params(CFG, seed=0)
    C, rho = 16, 8
    x = jnp.asarray(rng.normal(size=(2, 320, C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    xf = fold(x, rho)
    blocks, _ = _stage(params, 0, xf, rho)

    ref = folded_mrf_stage(xf + jnp.tile(bias, rho), blocks,
                           CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=16)
    got = folded_mrf_stage(xf, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=16,
                           in_bias=bias)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("s,Cin,ing,in_leaky", [(8, 24, 1, None),
                                                (16, 24, 2, None),
                                                (8, 24, 1, 0.1)])
def test_in_kernel_upsample_matches_xla_grouped(rng, s, Cin, ing, in_leaky):
    """The fused in-kernel upsample (r3, a == 1 stages) must reproduce the
    two-step XLA path: conv_transpose1d_grouped -> folded_mrf_stage,
    including the pre-upsample leaky when the producer did not fuse it."""
    from zerovox_tpu.ops import leaky_relu
    from zerovox_tpu.ops.conv import conv_transpose1d_grouped

    params = init_params(CFG, seed=0)
    C, rho = 16, 8                      # stage-0 blocks: chain lanes 128
    assert ing * rho == s
    R = 72                              # pre rows; L_out = R*s timesteps
    x = jnp.asarray(rng.normal(size=(2, R, Cin)), jnp.float32)
    w_up = jnp.asarray(rng.normal(size=(2 * s, Cin, C)) * 0.2, jnp.float32)
    b_up = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    blocks, _ = _stage(params, 0, fold(jnp.zeros((1, R * s, C)), rho), rho)

    xin = x if in_leaky is None else leaky_relu(x, in_leaky)
    y = conv_transpose1d_grouped(xin, w_up, b_up, stride=s, padding=s // 2,
                                 output_padding=0, rho_in=1, g=1)
    if ing > 1:
        pass                            # (B, R, s*C) rows already ing groups
    ref = folded_mrf_stage(y, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=32,
                           in_group=ing)

    got = folded_mrf_stage(
        x, blocks, CFG.resblock_dilations, CFG.resblock_kernel_size, rho,
        t_blk=32, in_group=ing, in_bias=b_up,
        upsample=dict(w=w_up, stride=s, padding=s // 2, output_padding=0,
                      rho_in=1, in_leaky=in_leaky))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("s,rho_in,g,in_leaky", [
    (4, 1, 2, None),     # a=2, ing=1 (g*s*C == 128)
    (4, 1, 2, 0.1),
    (3, 4, 8, None),     # a=2, ing=3 — the production stage-4 shape
    (3, 2, 8, None),     # a=4, ing=3
])
def test_in_kernel_upsample_a_grouped(rng, s, rho_in, g, in_leaky):
    """The a > 1 fused upsample (r4: the a-grouped-reshape trick inside the
    kernel, VERDICT r3 #5) must reproduce the two-step XLA path on the SAME
    source activation: conv_transpose1d_grouped(rho_in, g) followed by
    folded_mrf_stage(in_group) == folded_mrf_stage(a-grouped input,
    upsample=dict(g=g))."""
    from zerovox_tpu.ops import leaky_relu
    from zerovox_tpu.ops.conv import conv_transpose1d_grouped, fold

    params = init_params(CFG, seed=0)
    C, rho = 16, 8                      # stage-0 blocks: chain lanes 128
    Cin = 16
    a = g // rho_in
    assert a > 1
    ing = g * s // rho
    assert ing * rho == g * s
    R = 96                              # rho_in-folded source rows
    L_src = R * rho_in
    x = jnp.asarray(rng.normal(size=(2, R, rho_in * Cin)), jnp.float32)
    w_up = jnp.asarray(rng.normal(size=(2 * s, Cin, C)) * 0.2, jnp.float32)
    b_up = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    blocks, _ = _stage(params, 0, fold(jnp.zeros((1, L_src * s, C)), rho),
                       rho)

    xin = x if in_leaky is None else leaky_relu(x, in_leaky)
    y = conv_transpose1d_grouped(xin, w_up, b_up, stride=s,
                                 padding=s // 2 + s % 2,
                                 output_padding=s % 2, rho_in=rho_in, g=g)
    if ing == 3:
        y = y.reshape(y.shape[0], -1, y.shape[-1] // ing)   # XLA regroup
    ref = folded_mrf_stage(y, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=48,
                           in_group=1 if ing == 3 else ing)

    xg = x.reshape(x.shape[0], R // a, a * rho_in * Cin)    # a-grouped
    got = folded_mrf_stage(
        xg, blocks, CFG.resblock_dilations, CFG.resblock_kernel_size, rho,
        t_blk=48, in_group=ing, in_bias=b_up,
        upsample=dict(w=w_up, stride=s, padding=s // 2 + s % 2,
                      output_padding=s % 2, rho_in=rho_in, g=g,
                      in_leaky=in_leaky))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_in_kernel_upsample_a_grouped_bf16(rng):
    """The a>1 fusion's serving-path numerics (bf16 activations, bf16 MXU
    operands with f32 accumulation) must track the XLA grouped bf16 path —
    the production stage-4 shape (a=2, ing=3)."""
    from zerovox_tpu.ops.conv import conv_transpose1d_grouped, fold

    params = init_params(CFG, seed=0)
    C, rho, Cin, s, rho_in, g = 16, 8, 16, 3, 4, 8
    a, ing = g // rho_in, g * s // 8
    R = 96
    L_src = R * rho_in
    x = jnp.asarray(rng.normal(size=(2, R, rho_in * Cin)), jnp.bfloat16)
    w_up = jnp.asarray(rng.normal(size=(2 * s, Cin, C)) * 0.2, jnp.bfloat16)
    b_up = jnp.asarray(rng.normal(size=(C,)), jnp.bfloat16)
    blocks, _ = _stage(params, 0, fold(jnp.zeros((1, L_src * s, C),
                                                 jnp.bfloat16), rho), rho)
    blocks = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16), blocks)

    y = conv_transpose1d_grouped(x, w_up, b_up, stride=s,
                                 padding=s // 2 + s % 2,
                                 output_padding=s % 2, rho_in=rho_in, g=g)
    y = y.reshape(y.shape[0], -1, y.shape[-1] // ing)       # ing=3 regroup
    ref = folded_mrf_stage(y, blocks, CFG.resblock_dilations,
                           CFG.resblock_kernel_size, rho, t_blk=48)

    xg = x.reshape(x.shape[0], R // a, a * rho_in * Cin)
    got = folded_mrf_stage(
        xg, blocks, CFG.resblock_dilations, CFG.resblock_kernel_size, rho,
        t_blk=48, in_group=ing, in_bias=b_up,
        upsample=dict(w=w_up, stride=s, padding=s // 2 + s % 2,
                      output_padding=s % 2, rho_in=rho_in, g=g))
    ref32 = np.asarray(ref, np.float32)
    got32 = np.asarray(got, np.float32)
    # both sides quantize differently (the XLA path rounds the upsample
    # output to bf16 before the chain; the fused path keeps it f32) —
    # tolerance is a few bf16 ulps of the activation scale
    np.testing.assert_allclose(got32, ref32, atol=0.08, rtol=0.05)
    assert np.isfinite(got32).all()


@pytest.mark.parametrize("scales,C0,L,fuse_a,expect", [
    ((5, 3), 128, 60, False, "grouped a=2, ing=5 then the ing=3 XLA regroup"),
    ((2, 4), 64, 64, False, "grouped ing=1 then fused-up"),
    ((3, 5), 256, 60, False, "fused-up then grouped ing=5"),
    ((4, 2), 256, 48, False, "fused-up at two fold depths"),
    ((2, 2), 16, 64, False, "sub-128-lane chains: the XLA-folded fallback gate"),
    ((5, 3), 128, 60, True, "a=2 fused upsamples at ing=5 and ing=3"),
    ((5, 5, 4, 3), 512, 8, True,
     "the full production structure with the a=2 stage-4 fusion on"),
])
def test_vocode_geometry_sweep(rng, scales, C0, L, fuse_a, expect):
    """Every vocoder dispatch path (fused in-kernel upsample at a == 1 and,
    behind vocoder_fuse_a_upsample, at a > 1; grouped rows at a>1 incl. the
    ing=3 regroup; plain kernel; and the rho*C < 128 Mosaic-gate fallback)
    must agree with the XLA folded reference across non-production
    geometries — the r3 serve-on-TPU incident showed the config space
    beyond the production model was under-covered."""
    import dataclasses
    from zerovox_tpu.models.hifigan import vocode

    cfg = dataclasses.replace(
        CFG,
        hifigan_channels=C0,
        upsample_scales=tuple(scales),
        upsample_kernel_sizes=tuple(2 * s for s in scales),
        hop_size=int(np.prod(scales)),
        vocoder_fuse_a_upsample=fuse_a,
        max_seq_len=L)
    params = init_params(cfg, seed=0)
    mel = jnp.asarray(rng.normal(size=(2, L, cfg.num_mels)), jnp.float32)
    ref = vocode(params, dataclasses.replace(cfg, vocoder_backend="folded"),
                 mel)
    got = vocode(params, dataclasses.replace(cfg, vocoder_backend="pallas"),
                 mel)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4, err_msg=expect)
