"""Full-circle converter test: upstream-style torch checkpoint -> GGUF ->
load_params -> outputs match the torch oracles.

Exercises every zv2gguf.py transform the converter re-implements: name
shortening, weight-norm folding, ConvTranspose flip/permute, f16 casts,
sinusoid-table precompute.  Tolerances are f16-limited (the reference exporter
also stores conv weights as f16).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.models import fs2_encoder, styletts_decoder, hifigan
from zerovox_tpu.params import load_params
from zerovox_tpu.utils.convert import (convert_checkpoint, fold_weight_norm,
                                       shorten_tensor_name)

from oracles import torch_ref
from oracles.synthetic import (_wn, meldec_state_dict,
                               upstream_state_dict)

CFG = TINY_CONFIG


def test_shorten_names():
    assert (shorten_tensor_name(
        "_phoneme_encoder._encoder.layer_stack.0.slf_attn.w_qs.weight")
        == "_pe._enc.laystk.0.slf_attn.w_qs.w")
    assert (shorten_tensor_name(
        "_phoneme_encoder._variance_adaptor.energy_predictor.linear_layer.bias")
        == "_pe._var_adapt.engy_pred.linear_layer.b")


def test_fold_weight_norm_roundtrip(rng):
    w = rng.normal(size=(6, 3, 5)).astype(np.float32)
    v, g = _wn(torch.from_numpy(w))
    folded = fold_weight_norm(v.numpy(), g.numpy())
    np.testing.assert_allclose(folded, w, rtol=1e-6, atol=1e-6)


def test_full_circle_conversion(tmp_path, rng):
    torch.manual_seed(11)
    fs2 = torch_ref.TorchFS2Encoder(CFG).eval()
    dec = torch_ref.TorchStyleTTSDecoder(CFG).eval()
    voc = torch_ref.TorchHiFiGAN(CFG).eval()
    with torch.no_grad():
        voc.mean.normal_(0.0, 1.0)
        voc.scale.uniform_(0.5, 2.0)

    path = str(tmp_path / "converted.gguf")
    convert_checkpoint(
        path, upstream_state_dict(fs2, dec), CFG,
        meldec_state_dict=meldec_state_dict(voc),
        hifigan_stats={"mean": voc.mean, "scale": voc.scale})

    cfg, params = load_params(path)
    assert cfg.max_seq_len == CFG.max_seq_len

    B, P = 1, CFG.max_n_phonemes
    src = rng.integers(0, CFG.num_phonemes + 1, size=(B, P))
    pun = rng.integers(0, CFG.num_puncts + 1, size=(B, P))
    style = rng.normal(scale=0.1, size=(B, CFG.d_model)).astype(np.float32)

    # encoder parity (f16-limited tolerance: exporter casts conv weights)
    with torch.no_grad():
        ref_feat, ref_dur = fs2(torch.from_numpy(src), torch.from_numpy(pun),
                                torch.from_numpy(style))
    feat, dur = fs2_encoder.encode(params, cfg, jnp.asarray(src),
                                   jnp.asarray(pun), jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(dur), ref_dur.numpy(),
                               atol=5e-2, rtol=5e-2)

    # decoder parity
    hidden = rng.normal(size=(B, CFG.max_seq_len, CFG.d_model)).astype(np.float32)
    with torch.no_grad():
        ref_mel = dec(torch.from_numpy(hidden), torch.from_numpy(style))
    mel = styletts_decoder.decode(params, cfg, jnp.asarray(hidden),
                                  jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(mel), ref_mel.numpy(),
                               atol=5e-2, rtol=5e-2)

    # vocoder parity (incl. flipped ConvTranspose kernels through the file)
    melx = rng.normal(size=(B, 24, CFG.num_mels)).astype(np.float32)
    with torch.no_grad():
        ref_wav = voc(torch.from_numpy(melx))
    wav = hifigan.vocode(params, cfg, jnp.asarray(melx))
    np.testing.assert_allclose(np.asarray(wav), ref_wav.numpy(),
                               atol=5e-2, rtol=5e-2)


def test_convert_cli_end_to_end(tmp_path):
    """`python -m zerovox_tpu.utils.convert` on an upstream-layout
    directory tree (modelcfg.yaml + checkpoints/*.ckpt + HiFi-GAN
    checkpoint.pkl + stats.h5) produces a GGUF identical to the
    library-call converter's output."""
    import h5py
    import yaml

    from zerovox_tpu.utils import convert as conv_mod
    from oracles.synthetic import upstream_state_dict

    cfg = TINY_CONFIG
    torch.manual_seed(11)
    fs2 = torch_ref.TorchFS2Encoder(cfg).eval()
    dec = torch_ref.TorchStyleTTSDecoder(cfg).eval()
    voc = torch_ref.TorchHiFiGAN(cfg).eval()
    with torch.no_grad():
        voc.mean.normal_(0.0, 1.0)
        voc.scale.uniform_(0.5, 2.0)

    # upstream directory layout (zv2gguf.py:14-19, :64-92)
    mdir = tmp_path / "model"
    (mdir / "checkpoints").mkdir(parents=True)
    ycfg = {
        "model": {
            "max_seq_len": cfg.max_seq_len,
            "num_phonemes": cfg.num_phonemes,
            "num_puncts": cfg.num_puncts,
            "max_n_phonemes": cfg.max_n_phonemes,
            "emb_dim": cfg.emb_dim,
            "punct_emb_dim": cfg.punct_emb_dim,
            "encoder": {"fs2_layer": cfg.encoder_layer,
                        "fs2_head": cfg.encoder_head,
                        "vp_filter_size": cfg.vp_filter_size,
                        "vp_kernel_size": cfg.vp_kernel_size,
                        "ve_n_bins": cfg.ve_n_bins},
            "decoder": {"n_head": cfg.encoder_head,
                        "conv_filter_size": cfg.conv_filter_size,
                        "conv_kernel_size": list(cfg.conv_kernel_size)},
        },
        "audio": {"sampling_rate": cfg.sampling_rate,
                  "num_mels": cfg.num_mels, "hop_size": cfg.hop_size},
        # TINY uses a non-standard vocoder geometry; production checkpoints
        # omit this section and get the reference's hardcoded constants
        "hifigan": {"upsample_scales": list(cfg.upsample_scales),
                    "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
                    "channels": cfg.hifigan_channels,
                    "num_resblocks": cfg.num_resblocks,
                    "residual_dim": cfg.residual_dim,
                    "resblock_dilations": [list(d) for d
                                           in cfg.resblock_dilations]},
    }
    (mdir / "modelcfg.yaml").write_text(yaml.safe_dump(ycfg))
    torch.save({"state_dict": upstream_state_dict(fs2, dec)},
               str(mdir / "checkpoints" / "epoch1.ckpt"))

    hdir = tmp_path / "hifigan"
    hdir.mkdir()
    torch.save({"model": {"generator": meldec_state_dict(voc)}},
               str(hdir / "checkpoint.pkl"))
    with h5py.File(str(hdir / "stats.h5"), "w") as f:
        f["mean"] = voc.mean.numpy()
        f["scale"] = voc.scale.numpy()

    out_cli = str(tmp_path / "cli.gguf")
    assert conv_mod.main(["--model-dir", str(mdir),
                          "--hifigan-dir", str(hdir),
                          "--out", out_cli]) == 0

    out_lib = str(tmp_path / "lib.gguf")
    convert_checkpoint(out_lib, upstream_state_dict(fs2, dec), cfg,
                       meldec_state_dict=meldec_state_dict(voc),
                       hifigan_stats={"mean": voc.mean, "scale": voc.scale})

    cfg_a, pa = load_params(out_cli)
    cfg_b, pb = load_params(out_lib)
    assert cfg_a.to_json() == cfg_b.to_json()
    import jax
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
