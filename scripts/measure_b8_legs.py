"""Roofline-close the B=8 non-kernel legs (VERDICT r4 #1, §11 ninth finding).

§8's end-of-r4 B=8 attribution leaves three legs with no computed floor:
~4.5 ms "native convs" (decoder + stage-4 upsample on the batched
conv-emitter path), ~2.5 ms "regroup reshapes + dots", and ~1.3 ms front
(encoder + LR).  This script produces, from ONE fresh trace at B=8:

  1. a leg-classified device-time breakdown (every fusion assigned to
     kernels / decoder / stage4-upsample+regroup / front+LR / other by its
     HLO source attribution), and
  2. analytic MXU + HBM floors per leg from the production geometry,

printing floor-vs-measured per leg so each either shows real headroom
(then optimize) or closes with a number (then document).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_b8_legs.py [--batch 8] [--runs 10]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import re
import tempfile
from collections import defaultdict

from profile_trace import aggregate_trace

MXU_BF16 = 197e12          # v5e peak bf16 FLOP/s
HBM_BW = 820e9             # v5e HBM bytes/s


def _conv_line_legs():
    """conv.py line-range -> leg map built from the LIVE function objects
    (inspect.getsourcelines), so the classification survives edits instead
    of string-matching op names that don't carry the function."""
    import inspect

    from zerovox_tpu.ops import conv as C
    legs = {}
    for fn, leg in (
            (C.conv_transpose1d_grouped, "stage4-upsample"),
            (getattr(C, "conv_transpose1d_polyphase", None), "stage4-upsample"),
            (C.conv1d_folded_out_contract, "tail-conv"),
            (getattr(C, "_folded_out_contract_widened", None), "tail-conv"),
            (getattr(C, "build_wcontract", None), "tail-conv"),
            (getattr(C, "build_wtranspose_grouped", None), "stage4-upsample"),
    ):
        if fn is None:
            continue
        lines, start = inspect.getsourcelines(fn)
        legs[leg] = legs.get(leg, []) + [range(start, start + len(lines))]
    return legs


_CONV_LEGS = None


def classify(site: str) -> str:
    """Map an HLO source attribution (file:line op_name) to a leg."""
    global _CONV_LEGS
    s = site.lower()
    if "folded_mrf" in s:
        return "mrf-kernels"
    if "styletts_decoder" in s or "norm.py" in s:
        return "decoder"
    if "conv.py" in s:
        if _CONV_LEGS is None:
            _CONV_LEGS = _conv_line_legs()
        m = re.search(r"conv\.py:(\d+)", s)
        if m:
            ln = int(m.group(1))
            for leg, ranges in _CONV_LEGS.items():
                if any(ln in r for r in ranges):
                    return leg
    if "hifigan" in s:
        return "vocoder-glue"           # input conv, tail, mel-norm, biases
    if ("fs2_encoder" in s or "attention" in s or "length_regulator" in s
            or "misc.py" in s):
        return "front+LR"
    if "reshape" in s or "transpose" in s or "copy" in s:
        return "relayout"
    return "other"


def floors(cfg, B):
    """Analytic per-leg floors (ms) at batch B, bf16."""
    T = cfg.max_seq_len
    P = cfg.max_n_phonemes
    d = cfg.d_model

    def mxu(flops):
        return flops / MXU_BF16 * 1e3

    def hbm(bytes_):
        return bytes_ / HBM_BW * 1e3

    out = {}

    # ---- decoder (styletts_decoder.py): dense conv/1x1 FLOPs ----
    # channels: encode 528->1056, 1056->1056 (+1x1 shortcut); asr_res
    # 528->64; decode0/1: 1120->1056 (conv1 1120->1056, conv2 1056->1056,
    # 1x1 1120->1056), decode2: 1120->528(+1x1), decode3/4: 528->528;
    # to_out 528->80.  K=3 on conv1/conv2.
    ch = []
    C1, C2, R = d, 2 * d, cfg.residual_dim
    ch.append((C1, C2, 3)); ch.append((C1, C2, 1))            # encode0 + sc
    ch.append((C2, C2, 3)); ch.append((C2, C2, 3))            # encode0 c2, encode1 c1
    ch.append((C2, C2, 3))                                    # encode1 c2
    ch.append((C1, R, 1))                                     # asr_res
    for _ in range(2):                                        # decode0/1
        ch.append((C2 + R, C2, 3)); ch.append((C2, C2, 3))
        ch.append((C2 + R, C2, 1))
    ch.append((C2 + R, C1, 3)); ch.append((C1, C1, 3))        # decode2
    ch.append((C2 + R, C1, 1))
    for _ in range(2):                                        # decode3/4
        ch.append((C1, C1, 3)); ch.append((C1, C1, 3))
    ch.append((C1, cfg.num_mels, 1))                          # to_out
    dec_flops = sum(B * T * k * ci * co * 2 for ci, co, k in ch)
    # HBM: each resblock activation r+w once (bf16), ~10 passes of (B,T,C2)
    dec_bytes = 10 * B * T * C2 * 2 * 2
    out["decoder"] = (mxu(dec_flops), hbm(dec_bytes),
                      f"{dec_flops/1e9:.0f} GFLOP dense")

    # ---- stage-4 upsample + regroup (conv.py grouped path) ----
    s = cfg.upsample_scales
    c0 = cfg.hifigan_channels if hasattr(cfg, "hifigan_channels") else 512
    # channel ladder halves per upsample: 512->256->128->64->32; the LAST
    # upsample consumes the next-to-last width (production: 64 -> 32)
    cin = c0 // (2 ** (len(s) - 1))       # stage-4 input channels (64)
    cout = cin // 2                       # 32
    t_in = T * s[0] * s[1] * s[2]         # 150k at production
    k4 = 2 * s[3]
    up_flops = B * t_in * k4 * cin * cout * 2
    # regroup relayout: (B, t_in/?, g*rc) -> (B, 3*t_in, 128) r+w bf16
    regroup_bytes = 2 * B * t_in * s[3] * cout * 2
    out["stage4-upsample"] = (
        mxu(up_flops), hbm(regroup_bytes + 2 * B * t_in * cin * 2),
        f"{up_flops/1e9:.0f} GFLOP + regroup {regroup_bytes/1e6:.0f} MB")

    # ---- tail conv (k=7 output conv on the rho_in-folded rows) ----
    cin_t = c0 // (2 ** len(s))           # 32 at production
    samples = T * s[0] * s[1] * s[2] * s[3]
    tail_flops = B * samples * 7 * cin_t * 2
    tail_bytes = 2 * B * samples * cin_t * 2   # read act + ~write out
    out["tail-conv"] = (mxu(tail_flops), hbm(tail_bytes),
                        f"{tail_flops/1e9:.0f} GFLOP, "
                        f"{tail_bytes/1e6:.0f} MB r+w")

    # ---- front (fs2_encoder + LR) ----
    L = cfg.encoder_layer
    cf = cfg.conv_filter_size
    k1, k2 = cfg.conv_kernel_size
    mha = 4 * B * P * d * d * 2 + 2 * B * P * P * d * 2
    ffn = B * P * (k1 * d * cf + k2 * cf * d) * 2
    vp = 3 * B * P * (3 * d * 256 + 3 * 256 * 256) * 2
    fr_flops = L * (mha + ffn) + vp
    # LR gather: read+write (B, T, d) f32 once
    lr_bytes = 2 * B * T * d * 4
    out["front+LR"] = (mxu(fr_flops), hbm(lr_bytes),
                       f"{fr_flops/1e9:.1f} GFLOP, LR {lr_bytes/1e6:.0f} MB")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--detail", action="store_true",
                    help="print per-site lines inside each leg")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.models.pipeline import synthesize, cast_params
    from zerovox_tpu.params import init_params
    from zerovox_tpu.utils.profiling import trace

    cfg = ZeroVoxConfig(compute_dtype="bfloat16")
    params = cast_params(init_params(cfg, seed=0), jnp.bfloat16)

    B = args.batch
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, cfg.num_phonemes + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    pun = jnp.asarray(rng.integers(0, cfg.num_puncts + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    style = jnp.asarray(rng.normal(scale=0.1, size=(B, cfg.d_model)),
                        jnp.float32)

    fn = jax.jit(lambda p, a, b, c: synthesize(p, cfg, a, b, c).wav)
    hlo = fn.lower(params, src, pun, style).compile().as_text()
    pat = re.compile(r'%(\S+?) = .*?metadata=\{op_name="([^"]*)"'
                     r'(?: source_file="([^"]*)" source_line=(\d+))?')
    srcmap = {}
    for line in hlo.splitlines():
        m = pat.search(line)
        if m:
            name, op, f, ln = m.groups()
            srcmap[name] = ((f or "").split("/")[-1] + ":" + (ln or "?")
                            + " " + op[:80])
    fn(params, src, pun, style).block_until_ready()

    logdir = tempfile.mkdtemp(prefix="zv_b8legs_")
    with trace(logdir):
        for _ in range(args.runs):
            w = fn(params, src, pun, style)
        w.block_until_ready()
    import time
    time.sleep(2)

    agg = aggregate_trace(logdir, args.runs)
    legs = defaultdict(float)
    sites = defaultdict(lambda: defaultdict(float))
    for name, ms in agg.items():
        site = srcmap.get(name, "(unmapped) " + name[:70])
        leg = classify(site)
        legs[leg] += ms
        sites[leg][site] += ms
    total = sum(legs.values())

    print(f"\nB={B} device time {total:.3f} ms/run — leg breakdown:")
    fl = floors(cfg, B)
    for leg, ms in sorted(legs.items(), key=lambda kv: -kv[1]):
        line = f"  {ms:8.3f} ms  {leg}"
        if leg in fl:
            fm, fb, note = fl[leg]
            floor = max(fm, fb)
            line += (f"   floor {floor:.3f} ms (MXU {fm:.3f} / HBM {fb:.3f};"
                     f" {note}) -> {100*floor/ms:.0f}% of floor" if ms else "")
        print(line)
        if args.detail:
            for site, sms in sorted(sites[leg].items(), key=lambda kv: -kv[1])[:12]:
                print(f"        {sms:7.3f} ms  {site[:100]}")
    # the shared conv1d/linear dispatch sites (conv.py generic paths)
    # aggregate decoder convs + encoder FFN + input conv + 1x1 dots into
    # "other"; compare their SUM against the combined dense floor
    dec_f = fl["decoder"][0]
    fr_f = fl["front+LR"][0]
    agg = legs.get("other", 0.0) + legs.get("decoder", 0.0)
    comb = dec_f + fr_f
    if agg:
        print(f"  note: 'other'+'decoder' = {agg:.3f} ms carries the shared "
              f"conv/dot dispatch sites;\n        combined dense-FLOP floor "
              f"(decoder {dec_f:.2f} + front {fr_f:.2f}) = {comb:.3f} ms "
              f"-> {100*comb/agg:.0f}% of floor")


if __name__ == "__main__":
    main()
