"""Checkpoint converter: upstream zerovox torch checkpoints -> GGUF.

Re-implementation of the reference's offline exporter
(/root/reference/utils/zv2gguf.py) so users can produce framework-compatible
GGUF files straight from the upstream PyTorch Lightning checkpoint + HiFi-GAN
pickle + stats.h5.  Performs the same load-bearing transforms:

  - tensor-name shortening (zv2gguf.py:22-39)
  - weight-norm folding w = g * v / ||v||_dim0 (zv2gguf.py:164-173)
  - ConvTranspose kernel flip + in/out permute for _meldec.upsamples.*
    (zv2gguf.py:176-178)
  - selective f16 casts of conv / FFN weights (zv2gguf.py:156-161)
  - sinusoid position-table precompute (zv2gguf.py:41-62, :184-185)
  - the 14 uint32 hparams (zv2gguf.py:117-139)

Operates on numpy arrays; torch tensors are accepted and detached.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional

import numpy as np

from ..config import ZeroVoxConfig
from ..io.gguf import GGUFWriter
from ..ops.misc import sinusoid_encoding_table

# zv2gguf.py:22-30
SHORTNAMES = {
    "_phoneme_encoder": "_pe",
    "_encoder": "_enc",
    "layer_stack": "laystk",
    "weight": "w",
    "_variance_adaptor": "_var_adapt",
    "energy_predictor": "engy_pred",
    "bias": "b",
}

_UPSAMPLE_RE = re.compile(r"^_meldec\.upsamples\.[0-9]+\.1\.w$")
_F16_SUFFIXES = ("pos_ffn.w_1.w", "pos_ffn.w_2.w", "conv.w")


def shorten_tensor_name(long_name: str) -> str:
    s = long_name
    for l, sh in SHORTNAMES.items():
        s = s.replace(l, sh)
    return s


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def fold_weight_norm(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """torch._weight_norm(v, g, dim=0): w = g * v / ||v|| over dims != 0."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.reshape(norm.shape) * v / norm).astype(v.dtype)


def convert_state_dict(state_dict: Mapping[str, "np.ndarray"],
                       cfg: ZeroVoxConfig,
                       meldec_state_dict: Optional[Mapping] = None,
                       hifigan_stats: Optional[Mapping] = None,
                       ) -> Dict[str, np.ndarray]:
    """Upstream state dict -> {gguf tensor name: array} with all transforms.

    meldec_state_dict: the HiFi-GAN generator weights (grafted under _meldec.*
    exactly like zv2gguf.py:98-107, replacing any _meldec.* already present).
    hifigan_stats: {"mean": (num_mels,), "scale": (num_mels,)}.
    """
    sd = {k: _np(v) for k, v in state_dict.items()
          if not k.startswith("_meldec.")}
    if meldec_state_dict is not None:
        for k, v in meldec_state_dict.items():
            sd["_meldec." + k] = _np(v)

    out: Dict[str, np.ndarray] = {}
    if hifigan_stats is not None:
        out["hifigan.mean"] = _np(hifigan_stats["mean"]).astype(np.float32)
        out["hifigan.scale"] = _np(hifigan_stats["scale"]).astype(np.float32)

    for key in sorted(sd.keys()):
        tensor = sd[key]
        if tensor.ndim == 0:
            continue                       # zv2gguf.py:152-154
        sname = shorten_tensor_name(key)

        if key.endswith("weight_g"):
            continue                       # folded into the matching weight_v
        if key.endswith("weight_v"):
            gname = key.replace(".weight_v", ".weight_g")
            tensor = fold_weight_norm(tensor, sd[gname])
            sname = shorten_tensor_name(key.replace("weight_v", "weight"))
            if _UPSAMPLE_RE.match(sname):
                # flip along kernel dim, swap in/out channels (zv2gguf.py:176-178)
                tensor = np.ascontiguousarray(
                    tensor[:, :, ::-1].transpose(1, 0, 2))
            tensor = tensor.astype(np.float16)
        elif any(sname.endswith(sfx) for sfx in _F16_SUFFIXES):
            tensor = tensor.astype(np.float16)

        out[sname] = tensor

    out["sinusoid_encoding_table"] = sinusoid_encoding_table(
        cfg.max_seq_len + 1, cfg.d_model)
    return out


def write_gguf(path: str, tensors: Dict[str, np.ndarray], cfg: ZeroVoxConfig,
               include_config_json: bool = True):
    w = GGUFWriter(arch=cfg.GGUF_ARCH)
    for key, val in cfg.to_gguf_kv().items():
        w.add_uint32(key, val)
    if include_config_json:
        w.add_kv(cfg.GGUF_CONFIG_KEY, cfg.to_json())
    for name, arr in tensors.items():
        w.add_tensor(name, arr)
    w.write(path)


def convert_checkpoint(path_out: str, state_dict: Mapping, cfg: ZeroVoxConfig,
                       meldec_state_dict: Optional[Mapping] = None,
                       hifigan_stats: Optional[Mapping] = None):
    """One-call equivalent of running zv2gguf.py."""
    tensors = convert_state_dict(state_dict, cfg, meldec_state_dict,
                                 hifigan_stats)
    write_gguf(path_out, tensors, cfg)
