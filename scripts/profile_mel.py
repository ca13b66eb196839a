"""Per-segment device-time breakdown of mel production (encoder -> LR ->
StyleTTS decoder) on real TPU.

The vocoder got round-2 attention; this localizes the remaining ~1.3 ms of
mel production.  Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_mel.py
"""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.models import fs2_encoder, styletts_decoder
    from zerovox_tpu.models.pipeline import cast_params
    from zerovox_tpu.ops import durations_from_log, length_regulate
    from zerovox_tpu.params import init_params
    from zerovox_tpu.utils.profiling import device_time

    cfg = ZeroVoxConfig(compute_dtype="bfloat16")
    params = cast_params(init_params(cfg, seed=0), jnp.bfloat16)
    dt = jnp.bfloat16
    B = 1
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, cfg.num_phonemes + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    pun = jnp.asarray(rng.integers(0, cfg.num_puncts + 1,
                                   size=(B, cfg.max_n_phonemes)), jnp.int32)
    style = jnp.asarray(rng.normal(scale=0.1, size=(B, cfg.d_model)), jnp.float32)

    print(f"devices={jax.devices()}", file=sys.stderr, flush=True)

    def bench(name, fn, *args):
        t = device_time(fn, *args, iters=10, reps=3)
        print(f"{name:40s} {t*1e3:8.3f} ms", flush=True)
        return t

    def enc(p, s, pu, se):
        se = se.astype(dt)
        return fs2_encoder.encode(p, cfg, s, pu, se)

    bench("encoder (FFT stack + variance)", enc, params, src, pun, style)

    feats = jnp.asarray(rng.normal(size=(B, cfg.max_n_phonemes, cfg.d_model)), dt)
    log_dur = jnp.asarray(rng.normal(size=(B, cfg.max_n_phonemes)), jnp.float32)

    def lr(f, ld):
        dur = durations_from_log(ld, cfg.max_seq_len)
        hidden, mel_len = length_regulate(f, dur, cfg.max_seq_len)
        return hidden, mel_len

    bench("length regulator", lr, feats, log_dur)

    hidden = jnp.asarray(
        rng.normal(size=(B, cfg.max_seq_len, cfg.d_model)), dt)

    def dec(p, h, se):
        return styletts_decoder.decode(p, cfg, h, se.astype(dt))

    bench("styletts decoder (full)", dec, params, hidden, style)

    # decoder internals ---------------------------------------------------
    from zerovox_tpu.ops import conv1d, instance_norm

    T = cfg.max_seq_len

    def encode_blocks(p, h):
        x = styletts_decoder.res_blk1d(h, p["decoder"]["encode0"], cfg)
        return styletts_decoder.res_blk1d(x, p["decoder"]["encode1"], cfg)

    bench("  2x ResBlk1d 528->1056", encode_blocks, params, hidden)

    hdim = params["decoder"]["encode1"]["conv2_w"].shape[-1]
    x_mid = jnp.asarray(rng.normal(size=(B, T, hdim)), dt)

    def asr(p, h):
        a = p["decoder"]["asr_res"]
        y = conv1d(h, a["conv_w"], a["conv_b"])
        return instance_norm(y, a["norm_g"], a["norm_b"],
                             eps=cfg.instance_norm_eps)

    bench("  asr_res branch", asr, params, hidden)

    res_dim = params["decoder"]["asr_res"]["conv_w"].shape[-1]
    asr_feat = jnp.asarray(rng.normal(size=(B, T, res_dim)), dt)

    def adain_stack(p, x, a):
        dd = p["decoder"]
        st = style.astype(dt)
        for name in ("decode0", "decode1", "decode2"):
            x = jnp.concatenate([x, a], axis=-1)
            x = styletts_decoder.adain_res_blk1d(x, st, dd[name], cfg)
        x = styletts_decoder.adain_res_blk1d(x, st, dd["decode3"], cfg)
        return styletts_decoder.adain_res_blk1d(x, st, dd["decode4"], cfg)

    bench("  5x AdainResBlk1d", adain_stack, params, x_mid, asr_feat)

    out_in = params["decoder"]["to_out"]["conv_w"].shape[1]
    x_last = jnp.asarray(rng.normal(size=(B, T, out_in)), dt)

    def out_conv(p, x):
        o = p["decoder"]["to_out"]
        return conv1d(x, o["conv_w"], o["conv_b"])

    bench("  out conv -> mel", out_conv, params, x_last)


if __name__ == "__main__":
    main()
