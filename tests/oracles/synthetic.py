"""Synthetic-checkpoint builders shared by the converter round-trip test and
the reference-stage differential tests.

Builds upstream-style (pre-shortening) torch state dicts from the torch
oracle modules and writes them through the real converter
(zerovox_tpu.utils.convert), producing a GGUF that is reference-compatible by
construction — the reference's own gguf_init_from_file + stage classes load
it in tests/test_ggml_stage_diff.py.
"""

import torch

from zerovox_tpu.utils.convert import convert_checkpoint

from . import torch_ref


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


def build_synthetic_gguf(path: str, cfg, seed: int = 11,
                         duration_bias: float = 0.0):
    """Random torch oracle modules -> converter -> GGUF at `path`.

    duration_bias shifts the duration predictor's output bias so random
    weights yield non-trivial durations (exp(bias)-1 frames per phoneme on
    average) — exercising the length regulator's repeat/truncate paths.

    Returns (fs2, dec, voc) torch modules for oracle-side evaluation.
    """
    torch.manual_seed(seed)
    fs2 = torch_ref.TorchFS2Encoder(cfg).eval()
    dec = torch_ref.TorchStyleTTSDecoder(cfg).eval()
    voc = torch_ref.TorchHiFiGAN(cfg).eval()
    with torch.no_grad():
        voc.mean.normal_(0.0, 1.0)
        voc.scale.uniform_(0.5, 2.0)
        if duration_bias:
            fs2.duration_predictor.linear.bias += duration_bias
    convert_checkpoint(
        path, upstream_state_dict(fs2, dec), cfg,
        meldec_state_dict=meldec_state_dict(voc),
        hifigan_stats={"mean": voc.mean, "scale": voc.scale})
    return fs2, dec, voc
