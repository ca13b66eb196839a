"""PyTorch oracle implementations of the three TTS stages.

These mirror the upstream Python models the reference C++ was ported from
(FastSpeech2 by ming024, StyleTTS by yl4579, ParallelWaveGAN HiFi-GAN), at the
exact op sequences the reference graph-builders encode
(/root/reference/src/fs2encoder.cpp, stylettsdec.cpp, hifigan.cpp).  They are
the systematised version of the reference's manual oracle pattern
(utils/instnorm1d.py + norm1dexample.json): every zerovox_tpu stage is tested
against these within float tolerance.

Also provides converters from the torch modules' state to the zerovox_tpu
param pytree.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.params import decoder_block_dims, vocoder_stage_channels
from zerovox_tpu.ops.misc import sinusoid_encoding_table

torch.manual_seed(0)


# ============================================================== FastSpeech2

class TorchMHA(nn.Module):
    def __init__(self, d_model, n_head):
        super().__init__()
        self.n_head = n_head
        self.d_k = d_model // n_head
        self.w_qs = nn.Linear(d_model, d_model)
        self.w_ks = nn.Linear(d_model, d_model)
        self.w_vs = nn.Linear(d_model, d_model)
        self.fc = nn.Linear(d_model, d_model)
        self.layer_norm = nn.LayerNorm(d_model)
        self.temperature = math.sqrt(self.d_k)

    def forward(self, x):
        B, T, C = x.shape
        residual = x
        q = self.w_qs(x).view(B, T, self.n_head, self.d_k).permute(0, 2, 1, 3)
        k = self.w_ks(x).view(B, T, self.n_head, self.d_k).permute(0, 2, 1, 3)
        v = self.w_vs(x).view(B, T, self.n_head, self.d_k).permute(0, 2, 1, 3)
        attn = torch.matmul(q, k.transpose(-1, -2)) / self.temperature
        attn = torch.softmax(attn, dim=-1)          # no mask (parity w/ reference)
        out = torch.matmul(attn, v).permute(0, 2, 1, 3).reshape(B, T, C)
        return self.layer_norm(self.fc(out) + residual)


class TorchFFN(nn.Module):
    def __init__(self, d_in, d_hid, kernel_size):
        super().__init__()
        self.w_1 = nn.Conv1d(d_in, d_hid, kernel_size[0],
                             padding=(kernel_size[0] - 1) // 2)
        self.w_2 = nn.Conv1d(d_hid, d_in, kernel_size[1],
                             padding=(kernel_size[1] - 1) // 2)
        self.layer_norm = nn.LayerNorm(d_in)

    def forward(self, x):
        residual = x
        h = x.transpose(1, 2)
        h = self.w_2(F.relu(self.w_1(h)))
        return self.layer_norm(h.transpose(1, 2) + residual)


class TorchFFTBlock(nn.Module):
    def __init__(self, d_model, n_head, d_inner, kernel_size):
        super().__init__()
        self.slf_attn = TorchMHA(d_model, n_head)
        self.pos_ffn = TorchFFN(d_model, d_inner, kernel_size)

    def forward(self, x):
        return self.pos_ffn(self.slf_attn(x))


class TorchVariancePredictor(nn.Module):
    def __init__(self, d_in, filter_size, kernel_size):
        super().__init__()
        pad = (kernel_size - 1) // 2
        self.conv1 = nn.Conv1d(d_in, filter_size, kernel_size, padding=pad)
        self.ln1 = nn.LayerNorm(filter_size)
        self.conv2 = nn.Conv1d(filter_size, filter_size, kernel_size, padding=pad)
        self.ln2 = nn.LayerNorm(filter_size)
        self.linear = nn.Linear(filter_size, 1)

    def forward(self, x):
        h = self.conv1(x.transpose(1, 2)).transpose(1, 2)
        h = self.ln1(F.relu(h))
        h = self.conv2(h.transpose(1, 2)).transpose(1, 2)
        h = self.ln2(F.relu(h))
        return self.linear(h).squeeze(-1)


class TorchFS2Encoder(nn.Module):
    def __init__(self, cfg: ZeroVoxConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.d_model
        self.word_emb = nn.Embedding(cfg.num_phonemes + 1, cfg.emb_dim)
        self.punct_emb = nn.Embedding(cfg.num_puncts + 1, cfg.punct_emb_dim)
        table = sinusoid_encoding_table(cfg.max_seq_len + 1, d)
        self.register_buffer("pos_table", torch.from_numpy(table))
        self.layers = nn.ModuleList(
            TorchFFTBlock(d, cfg.encoder_head, cfg.conv_filter_size,
                          cfg.conv_kernel_size)
            for _ in range(cfg.encoder_layer))
        self.duration_predictor = TorchVariancePredictor(
            d, cfg.vp_filter_size, cfg.vp_kernel_size)
        self.pitch_predictor = TorchVariancePredictor(
            d, cfg.vp_filter_size, cfg.vp_kernel_size)
        self.energy_predictor = TorchVariancePredictor(
            d, cfg.vp_filter_size, cfg.vp_kernel_size)
        self.pitch_embedding = nn.Embedding(cfg.ve_n_bins, d)
        self.energy_embedding = nn.Embedding(cfg.ve_n_bins, d)

    def bucketize(self, pred):
        n = self.cfg.ve_n_bins
        return torch.clamp(torch.round(pred * (n - 1)).long(), min=0, max=n - 1)

    def forward(self, src_seq, puncts, style_embed):
        x = torch.cat([self.word_emb(src_seq), self.punct_emb(puncts)], dim=-1)
        P = src_seq.shape[1]
        x = x + self.pos_table[:P].unsqueeze(0)
        for layer in self.layers:
            x = layer(x)
        features = x + style_embed.unsqueeze(1)
        log_dur = self.duration_predictor(features)
        pitch = self.pitch_predictor(features)
        features = features + self.pitch_embedding(self.bucketize(pitch))
        energy = self.energy_predictor(features)
        features = features + self.energy_embedding(self.bucketize(energy))
        return features, log_dur


# ============================================================== StyleTTS dec

class TorchResBlk1d(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.learned_sc = dim_in != dim_out
        self.conv1 = nn.Conv1d(dim_in, dim_in, 3, 1, 1)
        self.conv2 = nn.Conv1d(dim_in, dim_out, 3, 1, 1)
        self.norm1 = nn.InstanceNorm1d(dim_in, affine=True)
        self.norm2 = nn.InstanceNorm1d(dim_in, affine=True)
        if self.learned_sc:
            self.conv1x1 = nn.Conv1d(dim_in, dim_out, 1, bias=False)
        self.actv = nn.LeakyReLU(0.2)

    def forward(self, x):                          # x: (B, C, T)
        sc = self.conv1x1(x) if self.learned_sc else x
        h = self.conv1(self.actv(self.norm1(x)))
        h = self.conv2(self.actv(self.norm2(h)))
        return (h + sc) / math.sqrt(2)


class TorchAdaIN1d(nn.Module):
    def __init__(self, style_dim, num_features):
        super().__init__()
        self.norm = nn.InstanceNorm1d(num_features, affine=False)
        self.fc = nn.Linear(style_dim, num_features * 2)

    def forward(self, x, s):
        h = self.fc(s).unsqueeze(-1)
        gamma, beta = torch.chunk(h, chunks=2, dim=1)
        return (1 + gamma) * self.norm(x) + beta


class TorchAdainResBlk1d(nn.Module):
    def __init__(self, dim_in, dim_out, style_dim):
        super().__init__()
        self.learned_sc = dim_in != dim_out
        self.norm1 = TorchAdaIN1d(style_dim, dim_in)
        self.norm2 = TorchAdaIN1d(style_dim, dim_out)
        self.conv1 = nn.Conv1d(dim_in, dim_out, 3, 1, 1)
        self.conv2 = nn.Conv1d(dim_out, dim_out, 3, 1, 1)
        if self.learned_sc:
            self.conv1x1 = nn.Conv1d(dim_in, dim_out, 1, bias=False)
        self.actv = nn.LeakyReLU(0.2)

    def forward(self, x, s):
        sc = self.conv1x1(x) if self.learned_sc else x
        h = self.conv1(self.actv(self.norm1(x, s)))
        h = self.conv2(self.actv(self.norm2(h, s)))
        return (h + sc) / math.sqrt(2)


class TorchStyleTTSDecoder(nn.Module):
    def __init__(self, cfg: ZeroVoxConfig):
        super().__init__()
        d, b, r = cfg.d_model, cfg.bottleneck_dim, cfg.residual_dim
        self.encode0 = TorchResBlk1d(d, b)
        self.encode1 = TorchResBlk1d(b, b)
        self.asr_res = nn.Sequential(
            nn.Conv1d(d, r, 1),
            nn.InstanceNorm1d(r, affine=True))
        dims = decoder_block_dims(cfg)
        self.decode = nn.ModuleList(
            TorchAdainResBlk1d(ci, co, cfg.style_dim) for ci, co in dims)
        self.to_out = nn.Conv1d(d, cfg.num_mels, 1)

    def forward(self, hidden, s):                  # hidden: (B, T, C)
        x = hidden.transpose(1, 2)
        asr_res = self.asr_res(x)
        h = self.encode1(self.encode0(x))
        for i, block in enumerate(self.decode):
            if i < 3:
                h = torch.cat([h, asr_res], dim=1)
            h = block(h, s)
        return self.to_out(h).transpose(1, 2)      # (B, T, num_mels)


# ============================================================== HiFi-GAN

class TorchHiFiGANResBlock(nn.Module):
    def __init__(self, channels, kernel_size, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList(
            nn.Conv1d(channels, channels, kernel_size, 1,
                      padding=(kernel_size - 1) // 2 * d, dilation=d)
            for d in dilations)
        self.convs2 = nn.ModuleList(
            nn.Conv1d(channels, channels, kernel_size, 1,
                      padding=(kernel_size - 1) // 2)
            for _ in dilations)

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(F.leaky_relu(x, 0.1))
            xt = c2(F.leaky_relu(xt, 0.1))
            x = x + xt
        return x


class TorchHiFiGAN(nn.Module):
    def __init__(self, cfg: ZeroVoxConfig):
        super().__init__()
        self.cfg = cfg
        ch = cfg.hifigan_channels
        pad = (cfg.hifigan_kernel_size - 1) // 2
        self.register_buffer("mean", torch.zeros(cfg.num_mels))
        self.register_buffer("scale", torch.ones(cfg.num_mels))
        self.input_conv = nn.Conv1d(cfg.num_mels, ch, cfg.hifigan_kernel_size,
                                    padding=pad)
        self.upsamples = nn.ModuleList()
        self.blocks = nn.ModuleList()
        for i, (s, k) in enumerate(zip(cfg.upsample_scales,
                                       cfg.upsample_kernel_sizes)):
            ci, co = vocoder_stage_channels(cfg)[i]
            self.upsamples.append(nn.ConvTranspose1d(
                ci, co, k, s, padding=s // 2 + s % 2, output_padding=s % 2))
            for j in range(cfg.num_resblocks):
                self.blocks.append(TorchHiFiGANResBlock(
                    co, cfg.resblock_kernel_size, cfg.resblock_dilations[j]))
        c_last = ch // (2 ** len(cfg.upsample_scales))
        self.output_conv = nn.Conv1d(c_last, 1, cfg.hifigan_kernel_size,
                                     padding=pad)

    def forward(self, mel):                        # mel: (B, T, num_mels)
        cfg = self.cfg
        x = (mel - self.mean) / self.scale
        c = self.input_conv(x.transpose(1, 2))
        for i in range(len(cfg.upsample_scales)):
            c = self.upsamples[i](F.leaky_relu(c, 0.1))
            cs = 0.0
            for j in range(cfg.num_resblocks):
                cs = cs + self.blocks[i * cfg.num_resblocks + j](c)
            c = cs / cfg.num_resblocks
        c = self.output_conv(F.leaky_relu(c, 0.01))
        return torch.tanh(c).squeeze(1)            # (B, T*hop)


# ====================================================== param converters

def _np(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def _lin(m: nn.Linear):
    return np.ascontiguousarray(_np(m.weight).T), _np(m.bias)


def _conv(m: nn.Conv1d):
    w = np.ascontiguousarray(_np(m.weight).transpose(2, 1, 0))
    b = _np(m.bias) if m.bias is not None else None
    return w, b


def _convT_flipped(m: nn.ConvTranspose1d):
    """torch ConvTranspose1d weight (Cin, Cout, K) -> flipped (K, Cin, Cout)."""
    w = _np(m.weight)[:, :, ::-1]
    return np.ascontiguousarray(w.transpose(2, 0, 1))


def fs2_to_params(m: TorchFS2Encoder) -> dict:
    layers = []
    for lyr in m.layers:
        a = lyr.slf_attn
        wq, bq = _lin(a.w_qs)
        wk, bk = _lin(a.w_ks)
        wv, bv = _lin(a.w_vs)
        wo, bo = _lin(a.fc)
        f = lyr.pos_ffn
        w1, b1 = _conv(f.w_1)
        w2, b2 = _conv(f.w_2)
        layers.append({
            "attn": {"wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
                     "wo": wo, "bo": bo,
                     "ln_g": _np(a.layer_norm.weight), "ln_b": _np(a.layer_norm.bias)},
            "ffn": {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
                    "ln_g": _np(f.layer_norm.weight), "ln_b": _np(f.layer_norm.bias)},
        })

    def vp(p: TorchVariancePredictor):
        c1w, c1b = _conv(p.conv1)
        c2w, c2b = _conv(p.conv2)
        lw, lb = _lin(p.linear)
        return {"conv1_w": c1w, "conv1_b": c1b, "conv2_w": c2w, "conv2_b": c2b,
                "ln1_g": _np(p.ln1.weight), "ln1_b": _np(p.ln1.bias),
                "ln2_g": _np(p.ln2.weight), "ln2_b": _np(p.ln2.bias),
                "lin_w": lw, "lin_b": lb}

    return {
        "word_emb": _np(m.word_emb.weight),
        "punct_emb": _np(m.punct_emb.weight),
        "pos_table": _np(m.pos_table),
        "layers": layers,
        "duration_predictor": vp(m.duration_predictor),
        "pitch_predictor": vp(m.pitch_predictor),
        "energy_predictor": vp(m.energy_predictor),
        "pitch_emb": _np(m.pitch_embedding.weight),
        "energy_emb": _np(m.energy_embedding.weight),
    }


def resblk_to_params(m: TorchResBlk1d) -> dict:
    c1w, c1b = _conv(m.conv1)
    c2w, c2b = _conv(m.conv2)
    p = {"conv1_w": c1w, "conv1_b": c1b, "conv2_w": c2w, "conv2_b": c2b,
         "norm1_g": _np(m.norm1.weight), "norm1_b": _np(m.norm1.bias),
         "norm2_g": _np(m.norm2.weight), "norm2_b": _np(m.norm2.bias)}
    if m.learned_sc:
        p["conv1x1_w"] = _conv(m.conv1x1)[0]
    return p


def adainblk_to_params(m: TorchAdainResBlk1d) -> dict:
    f1w, f1b = _lin(m.norm1.fc)
    f2w, f2b = _lin(m.norm2.fc)
    c1w, c1b = _conv(m.conv1)
    c2w, c2b = _conv(m.conv2)
    p = {"fc1_w": f1w, "fc1_b": f1b, "fc2_w": f2w, "fc2_b": f2b,
         "conv1_w": c1w, "conv1_b": c1b, "conv2_w": c2w, "conv2_b": c2b}
    if m.learned_sc:
        p["conv1x1_w"] = _conv(m.conv1x1)[0]
    return p


def decoder_to_params(m: TorchStyleTTSDecoder) -> dict:
    arw, arb = _conv(m.asr_res[0])
    tow, tob = _conv(m.to_out)
    p = {
        "encode0": resblk_to_params(m.encode0),
        "encode1": resblk_to_params(m.encode1),
        "asr_res": {"conv_w": arw, "conv_b": arb,
                    "norm_g": _np(m.asr_res[1].weight),
                    "norm_b": _np(m.asr_res[1].bias)},
        "to_out": {"conv_w": tow, "conv_b": tob},
    }
    for i, blk in enumerate(m.decode):
        p[f"decode{i}"] = adainblk_to_params(blk)
    return p


def hifigan_to_params(m: TorchHiFiGAN) -> dict:
    icw, icb = _conv(m.input_conv)
    ocw, ocb = _conv(m.output_conv)
    p = {"mean": _np(m.mean), "scale": _np(m.scale),
         "input_conv_w": icw, "input_conv_b": icb,
         "output_conv_w": ocw, "output_conv_b": ocb,
         "upsamples": [], "blocks": []}
    for up in m.upsamples:
        p["upsamples"].append({"w": _convT_flipped(up), "b": _np(up.bias)})
    for blk in m.blocks:
        entry = {"convs1": [], "convs2": []}
        for c1, c2 in zip(blk.convs1, blk.convs2):
            w1, b1 = _conv(c1)
            w2, b2 = _conv(c2)
            entry["convs1"].append({"w": w1, "b": b1})
            entry["convs2"].append({"w": w2, "b": b2})
        p["blocks"].append(entry)
    return p
