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

CFG = TINY_CONFIG


def _wn(w: torch.Tensor):
    """Decompose a weight into (weight_v, weight_g) s.t. folding returns w."""
    v = w.detach().clone()
    axes = tuple(range(1, v.ndim))
    g = torch.sqrt((v.double() ** 2).sum(dim=axes, keepdim=True)).to(v.dtype)
    return v, g


def _put(sd, prefix, module, weight_norm=False, bias=True):
    if weight_norm:
        v, g = _wn(module.weight)
        sd[prefix + ".weight_v"] = v
        sd[prefix + ".weight_g"] = g
    else:
        sd[prefix + ".weight"] = module.weight.detach()
    if bias and getattr(module, "bias", None) is not None:
        sd[prefix + ".bias"] = module.bias.detach()


def upstream_state_dict(fs2, dec):
    """Flat upstream-named (pre-shortening) state dict for encoder+decoder."""
    sd = {}
    pe = "_phoneme_encoder._encoder."
    sd[pe + "src_word_emb.weight"] = fs2.word_emb.weight.detach()
    sd[pe + "punct_embed.weight"] = fs2.punct_emb.weight.detach()
    for i, lyr in enumerate(fs2.layers):
        p = pe + f"layer_stack.{i}."
        a = lyr.slf_attn
        for nm, mod in (("w_qs", a.w_qs), ("w_ks", a.w_ks), ("w_vs", a.w_vs),
                        ("fc", a.fc), ("layer_norm", a.layer_norm)):
            _put(sd, p + "slf_attn." + nm, mod)
        f = lyr.pos_ffn
        _put(sd, p + "pos_ffn.w_1", f.w_1)
        _put(sd, p + "pos_ffn.w_2", f.w_2)
        _put(sd, p + "pos_ffn.layer_norm", f.layer_norm)

    va = "_phoneme_encoder._variance_adaptor."
    for nm, vp in (("duration_predictor", fs2.duration_predictor),
                   ("pitch_predictor", fs2.pitch_predictor),
                   ("energy_predictor", fs2.energy_predictor)):
        p = va + nm + "."
        _put(sd, p + "conv_layer.conv1d_1.conv", vp.conv1)
        _put(sd, p + "conv_layer.conv1d_2.conv", vp.conv2)
        _put(sd, p + "conv_layer.layer_norm_1", vp.ln1)
        _put(sd, p + "conv_layer.layer_norm_2", vp.ln2)
        _put(sd, p + "linear_layer", vp.linear)
    sd[va + "pitch_embedding.weight"] = fs2.pitch_embedding.weight.detach()
    sd[va + "energy_embedding.weight"] = fs2.energy_embedding.weight.detach()

    md = "_mel_decoder."
    for i, blk in enumerate((dec.encode0, dec.encode1)):
        p = md + f"encode.{i}."
        _put(sd, p + "conv1", blk.conv1, weight_norm=True)
        _put(sd, p + "conv2", blk.conv2, weight_norm=True)
        _put(sd, p + "norm1", blk.norm1)
        _put(sd, p + "norm2", blk.norm2)
        if blk.learned_sc:
            _put(sd, p + "conv1x1", blk.conv1x1, weight_norm=True, bias=False)
    _put(sd, md + "asr_res.0", dec.asr_res[0], weight_norm=True)
    _put(sd, md + "asr_res.1", dec.asr_res[1])
    for i, blk in enumerate(dec.decode):
        p = md + f"decode.{i}."
        _put(sd, p + "norm1.fc", blk.norm1.fc)
        _put(sd, p + "norm2.fc", blk.norm2.fc)
        _put(sd, p + "conv1", blk.conv1, weight_norm=True)
        _put(sd, p + "conv2", blk.conv2, weight_norm=True)
        if blk.learned_sc:
            _put(sd, p + "conv1x1", blk.conv1x1, weight_norm=True, bias=False)
    _put(sd, md + "to_out.0", dec.to_out, weight_norm=True)
    return sd


def meldec_state_dict(voc):
    """HiFi-GAN generator state dict (ParallelWaveGAN naming, weight-normed)."""
    sd = {}
    _put(sd, "input_conv", voc.input_conv, weight_norm=True)
    for i, up in enumerate(voc.upsamples):
        _put(sd, f"upsamples.{i}.1", up, weight_norm=True)
    for i, blk in enumerate(voc.blocks):
        for j, (c1, c2) in enumerate(zip(blk.convs1, blk.convs2)):
            _put(sd, f"blocks.{i}.convs1.{j}.1", c1, weight_norm=True)
            _put(sd, f"blocks.{i}.convs2.{j}.1", c2, weight_norm=True)
    _put(sd, "output_conv.1", voc.output_conv, weight_norm=True)
    return sd


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
