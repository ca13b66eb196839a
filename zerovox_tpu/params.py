"""Parameter pytrees + GGUF name mapping.

The reference looks every weight up by name from the GGUF-populated ggml
context (checked_get_tensor, /root/reference/src/utils.cpp:9-17).  Here the
same names map into a nested-dict pytree of jnp arrays, with layout transforms
applied once at load time:

  GGUF (numpy order)                      ours
  Linear  w: (out, in)              ->    (in, out)              x @ w
  Conv1d  w: (out, in, K)           ->    (K, in, out)           HIO
  ConvT1d w: (out, in, K) pre-flipped ->  (K, in, out)           flipped-HIO
  Embedding/vectors                 ->    unchanged

GGUF tensor names follow utils/zv2gguf.py's shortening scheme
(`_pe._enc.laystk.{i}.slf_attn.w_qs.w`, `_mel_decoder.decode.{i}.norm1.fc.w`,
`_meldec.blocks.{i}.convs1.{d}.1.w`, ...).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ZeroVoxConfig
from .ops.misc import sinusoid_encoding_table


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 1, 0))


# --------------------------------------------------------------------------
# GGUF name map: tree path (tuple) -> (gguf name, transform gguf->ours)
# --------------------------------------------------------------------------

def gguf_name_map(cfg: ZeroVoxConfig) -> Dict[tuple, tuple]:
    m: Dict[tuple, tuple] = {}

    def add(path, name, transform=None):
        m[path] = (name, transform)

    # ---- FastSpeech2 encoder --------------------------------------------
    add(("encoder", "word_emb"), "_pe._enc.src_word_emb.w")
    add(("encoder", "punct_emb"), "_pe._enc.punct_embed.w")
    add(("encoder", "pos_table"), "sinusoid_encoding_table")
    for i in range(cfg.encoder_layer):
        pre = f"_pe._enc.laystk.{i}"
        for ours, theirs in (("wq", "w_qs"), ("wk", "w_ks"), ("wv", "w_vs"), ("wo", "fc")):
            add(("encoder", "layers", i, "attn", ours), f"{pre}.slf_attn.{theirs}.w", _t_linear)
            add(("encoder", "layers", i, "attn", "b" + ours[1]), f"{pre}.slf_attn.{theirs}.b")
        add(("encoder", "layers", i, "attn", "ln_g"), f"{pre}.slf_attn.layer_norm.w")
        add(("encoder", "layers", i, "attn", "ln_b"), f"{pre}.slf_attn.layer_norm.b")
        add(("encoder", "layers", i, "ffn", "w1"), f"{pre}.pos_ffn.w_1.w", _t_conv)
        add(("encoder", "layers", i, "ffn", "b1"), f"{pre}.pos_ffn.w_1.b")
        add(("encoder", "layers", i, "ffn", "w2"), f"{pre}.pos_ffn.w_2.w", _t_conv)
        add(("encoder", "layers", i, "ffn", "b2"), f"{pre}.pos_ffn.w_2.b")
        add(("encoder", "layers", i, "ffn", "ln_g"), f"{pre}.pos_ffn.layer_norm.w")
        add(("encoder", "layers", i, "ffn", "ln_b"), f"{pre}.pos_ffn.layer_norm.b")

    for ours, theirs in (("duration_predictor", "duration_predictor"),
                         ("pitch_predictor", "pitch_predictor"),
                         ("energy_predictor", "engy_pred")):
        pre = f"_pe._var_adapt.{theirs}"
        add(("encoder", ours, "conv1_w"), f"{pre}.conv_layer.conv1d_1.conv.w", _t_conv)
        add(("encoder", ours, "conv1_b"), f"{pre}.conv_layer.conv1d_1.conv.b")
        add(("encoder", ours, "conv2_w"), f"{pre}.conv_layer.conv1d_2.conv.w", _t_conv)
        add(("encoder", ours, "conv2_b"), f"{pre}.conv_layer.conv1d_2.conv.b")
        add(("encoder", ours, "ln1_g"), f"{pre}.conv_layer.layer_norm_1.w")
        add(("encoder", ours, "ln1_b"), f"{pre}.conv_layer.layer_norm_1.b")
        add(("encoder", ours, "ln2_g"), f"{pre}.conv_layer.layer_norm_2.w")
        add(("encoder", ours, "ln2_b"), f"{pre}.conv_layer.layer_norm_2.b")
        # linear_layer.w is stored as a flat (filter,) vector in the GGUF
        add(("encoder", ours, "lin_w"), f"{pre}.linear_layer.w",
            lambda w: np.ascontiguousarray(w.reshape(-1, 1)))
        add(("encoder", ours, "lin_b"), f"{pre}.linear_layer.b")

    add(("encoder", "pitch_emb"), "_pe._var_adapt.pitch_embedding.w")
    add(("encoder", "energy_emb"), "_pe._var_adapt.energy_embedding.w")

    # ---- StyleTTS decoder ------------------------------------------------
    dim_in = cfg.d_model
    bdim = cfg.bottleneck_dim
    for idx, (ci, co) in enumerate(((dim_in, bdim), (bdim, bdim))):
        pre = f"_mel_decoder.encode.{idx}"
        blk = ("decoder", f"encode{idx}")
        add(blk + ("conv1_w",), f"{pre}.conv1.w", _t_conv)
        add(blk + ("conv1_b",), f"{pre}.conv1.b")
        add(blk + ("conv2_w",), f"{pre}.conv2.w", _t_conv)
        add(blk + ("conv2_b",), f"{pre}.conv2.b")
        add(blk + ("norm1_g",), f"{pre}.norm1.w")
        add(blk + ("norm1_b",), f"{pre}.norm1.b")
        add(blk + ("norm2_g",), f"{pre}.norm2.w")
        add(blk + ("norm2_b",), f"{pre}.norm2.b")
        if ci != co:
            add(blk + ("conv1x1_w",), f"{pre}.conv1x1.w", _t_conv)

    add(("decoder", "asr_res", "conv_w"), "_mel_decoder.asr_res.0.w", _t_conv)
    add(("decoder", "asr_res", "conv_b"), "_mel_decoder.asr_res.0.b")
    add(("decoder", "asr_res", "norm_g"), "_mel_decoder.asr_res.1.w")
    add(("decoder", "asr_res", "norm_b"), "_mel_decoder.asr_res.1.b")

    for idx, (ci, co) in enumerate(decoder_block_dims(cfg)):
        pre = f"_mel_decoder.decode.{idx}"
        blk = ("decoder", f"decode{idx}")
        add(blk + ("fc1_w",), f"{pre}.norm1.fc.w", _t_linear)
        add(blk + ("fc1_b",), f"{pre}.norm1.fc.b")
        add(blk + ("fc2_w",), f"{pre}.norm2.fc.w", _t_linear)
        add(blk + ("fc2_b",), f"{pre}.norm2.fc.b")
        add(blk + ("conv1_w",), f"{pre}.conv1.w", _t_conv)
        add(blk + ("conv1_b",), f"{pre}.conv1.b")
        add(blk + ("conv2_w",), f"{pre}.conv2.w", _t_conv)
        add(blk + ("conv2_b",), f"{pre}.conv2.b")
        if ci != co:
            add(blk + ("conv1x1_w",), f"{pre}.conv1x1.w", _t_conv)

    add(("decoder", "to_out", "conv_w"), "_mel_decoder.to_out.0.w", _t_conv)
    add(("decoder", "to_out", "conv_b"), "_mel_decoder.to_out.0.b")

    # ---- HiFi-GAN vocoder ------------------------------------------------
    add(("vocoder", "mean"), "hifigan.mean")
    add(("vocoder", "scale"), "hifigan.scale")
    add(("vocoder", "input_conv_w"), "_meldec.input_conv.w", _t_conv)
    add(("vocoder", "input_conv_b"), "_meldec.input_conv.b")
    add(("vocoder", "output_conv_w"), "_meldec.output_conv.1.w", _t_conv)
    add(("vocoder", "output_conv_b"), "_meldec.output_conv.1.b")
    for i in range(len(cfg.upsample_scales)):
        # already flipped+permuted at export (utils/zv2gguf.py:176-178):
        # stored (out, in, K); _t_conv yields our flipped-HIO layout.
        add(("vocoder", "upsamples", i, "w"), f"_meldec.upsamples.{i}.1.w", _t_conv)
        add(("vocoder", "upsamples", i, "b"), f"_meldec.upsamples.{i}.1.b")
        for j in range(cfg.num_resblocks):
            bidx = i * cfg.num_resblocks + j
            for d in range(len(cfg.resblock_dilations[j])):
                for cset in ("convs1", "convs2"):
                    add(("vocoder", "blocks", bidx, cset, d, "w"),
                        f"_meldec.blocks.{bidx}.{cset}.{d}.1.w", _t_conv)
                    add(("vocoder", "blocks", bidx, cset, d, "b"),
                        f"_meldec.blocks.{bidx}.{cset}.{d}.1.b")
    return m


def decoder_block_dims(cfg: ZeroVoxConfig) -> List[tuple]:
    """(dim_in, dim_out) of the five AdainResBlk1d stages
    (/root/reference/src/zerovox.cpp:119-125, src/stylettsdec.cpp:315-319)."""
    d, b, r = cfg.d_model, cfg.bottleneck_dim, cfg.residual_dim
    return [(b + r, b), (b + r, b), (b + r, d), (d, d), (d, d)]


def vocoder_stage_channels(cfg: ZeroVoxConfig) -> List[tuple]:
    """(C_in, C_out) per upsample stage (channels halve each stage)."""
    c = cfg.hifigan_channels
    return [(c // (2 ** i), c // (2 ** (i + 1)))
            for i in range(len(cfg.upsample_scales))]


# --------------------------------------------------------------------------
# tree plumbing
# --------------------------------------------------------------------------

def _set_path(tree: dict, path: tuple, value):
    node = tree
    for i, key in enumerate(path[:-1]):
        nxt_key = path[i + 1]
        if isinstance(key, int):
            while len(node) <= key:
                node.append({} if not isinstance(nxt_key, int) else [])
            node = node[key]
        else:
            if key not in node:
                node[key] = [] if isinstance(nxt_key, int) else {}
            node = node[key]
    last = path[-1]
    if isinstance(last, int):
        while len(node) <= last:
            node.append(None)
        node[last] = value
    else:
        node[last] = value


def get_path(tree, path: tuple):
    node = tree
    for key in path:
        node = node[key]
    return node


def params_from_arrays(arrays: Dict[str, np.ndarray], cfg: ZeroVoxConfig,
                       dtype=jnp.float32, strict: bool = True) -> dict:
    """Build the param pytree from a {gguf_name: numpy array} dict."""
    name_map = gguf_name_map(cfg)
    tree: dict = {}
    missing = []
    for path, (name, transform) in name_map.items():
        if name not in arrays:
            missing.append(name)
            continue
        a = np.asarray(arrays[name], dtype=np.float32)
        if transform is not None:
            a = transform(a)
        _set_path(tree, path, jnp.asarray(a, dtype=dtype))
    if missing and strict:
        raise KeyError(f"{len(missing)} tensors missing from checkpoint, e.g. {missing[:5]}")
    return tree


def params_to_arrays(params: dict, cfg: ZeroVoxConfig) -> Dict[str, np.ndarray]:
    """Inverse of params_from_arrays (reference GGUF layouts/names)."""
    name_map = gguf_name_map(cfg)
    out: Dict[str, np.ndarray] = {}
    for path, (name, transform) in name_map.items():
        a = np.asarray(get_path(params, path), dtype=np.float32)
        if transform is _t_linear:
            a = np.ascontiguousarray(a.T)
        elif transform is _t_conv:
            a = np.ascontiguousarray(a.transpose(2, 1, 0))
        elif transform is not None:      # variance-predictor linear vector
            a = np.ascontiguousarray(a.reshape(-1))
        out[name] = a
    return out


def load_params(path: str, cfg: Optional[ZeroVoxConfig] = None,
                dtype=jnp.float32, use_native: bool = True):
    """Load a GGUF checkpoint -> (config, params pytree).

    Metadata is parsed by the pure-Python reader; bulk tensor bytes go through
    the native mmap loader (zerovox_tpu.io.native) when it is available.
    """
    from .io.gguf import GGUFReader
    from .io import native
    with GGUFReader(path) as r:
        if cfg is None:
            cfg = ZeroVoxConfig.from_gguf_kv(r.kv)
        if use_native and native.available():
            arrays = None
        else:
            arrays = r.load_all(as_float32=True)
    if arrays is None:
        try:
            with native.NativeGGUF(path) as ng:
                arrays = ng.load_all(as_float32=True)
        except NotImplementedError:
            # quantized tensors: the Python reader dequantizes them
            with GGUFReader(path) as r:
                arrays = r.load_all(as_float32=True)
    return cfg, params_from_arrays(arrays, cfg, dtype=dtype)


def save_params(path: str, params: dict, cfg: ZeroVoxConfig,
                quantize: Optional[str] = None):
    """Write params + hparams to a reference-compatible GGUF file.

    quantize="q8_0" stores large matrix/conv weights as 8-bit blocks (~3.6x
    smaller file); embeddings, biases and norm vectors stay f32.  The loader
    dequantizes transparently (q8_0 files are ours-only: the reference
    binary needs f16 conv kernels).

    Conv kernels (the 3-d tensors) are stored f16, matching the reference
    exporter's selective casts (utils/zv2gguf.py:156-161,:176-178): ggml's
    conv path hard-asserts F16 kernels (im2col, ggml-cpu.c), so an
    all-f32 file loads into the reference binary but crashes its first
    graph compute — caught by `cli --verify` on a save_params round-trip.
    """
    from .io.gguf import GGUFWriter, GGMLType
    w = GGUFWriter(arch=cfg.GGUF_ARCH)
    for key, val in cfg.to_gguf_kv().items():
        w.add_uint32(key, val)
    w.add_kv(cfg.GGUF_CONFIG_KEY, cfg.to_json())
    for name, arr in params_to_arrays(params, cfg).items():
        quantizable = (arr.ndim >= 2 and arr.size % 32 == 0
                       and arr.size >= 4096 and "emb" not in name
                       and name != "sinusoid_encoding_table")
        if quantize == "q8_0" and quantizable:
            w.add_tensor(name, arr, ggml_type=GGMLType.Q8_0)
        elif arr.ndim == 3:              # conv kernel -> f16 (reference cast)
            w.add_tensor(name, arr.astype(np.float16))
        else:
            w.add_tensor(name, arr)
    w.write(path)


# --------------------------------------------------------------------------
# random init (for tests / benches / synthetic checkpoints)
# --------------------------------------------------------------------------

def init_params(cfg: ZeroVoxConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random parameters with the exact reference shapes.

    Gains are scaled so activations stay O(1) through the deep vocoder stack —
    enough for numerics tests and benchmarking (not a trained model).
    """
    rng = np.random.default_rng(seed)
    name_map = gguf_name_map(cfg)
    tree: dict = {}

    def randn(shape, scale):
        return jnp.asarray(rng.normal(0.0, scale, size=shape), dtype=dtype)

    for path, (name, transform) in name_map.items():
        shape = _param_shape(path, cfg)
        leaf = path[-1]
        if name == "sinusoid_encoding_table":
            val = jnp.asarray(sinusoid_encoding_table(*shape), dtype=dtype)
        elif path[:3] == ("encoder", "duration_predictor", "lin_b"):
            # bias synthetic models toward ~2-3 frames/phoneme so random-weight
            # demos and benches exercise a realistic length-regulator pattern
            val = jnp.full(shape, 1.2, dtype=dtype)
        elif path[:3] == ("encoder", "duration_predictor", "lin_w"):
            # keep the random head small so the duration bias dominates
            val = randn(shape, 0.1 / max(1.0, np.sqrt(shape[0])))
        elif leaf.endswith("_b") or leaf.startswith("b") or leaf in ("mean",):
            val = jnp.zeros(shape, dtype=dtype)
        elif leaf in ("ln_g", "ln1_g", "ln2_g", "norm_g", "norm1_g", "norm2_g", "scale"):
            val = jnp.ones(shape, dtype=dtype)
        else:
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            val = randn(shape, 1.0 / max(1.0, np.sqrt(fan_in)))
        _set_path(tree, path, val)
    return tree


def _param_shape(path: tuple, cfg: ZeroVoxConfig) -> tuple:
    """Shape (in our layout) of every parameter in the tree."""
    d = cfg.d_model
    section = path[0]
    leaf = path[-1]

    if section == "encoder":
        if path[1] == "word_emb":
            return (cfg.num_phonemes + 1, cfg.emb_dim)
        if path[1] == "punct_emb":
            return (cfg.num_puncts + 1, cfg.punct_emb_dim)
        if path[1] == "pos_table":
            return (cfg.max_seq_len + 1, d)
        if path[1] == "pitch_emb" or path[1] == "energy_emb":
            return (cfg.ve_n_bins, d)
        if path[1] == "layers":
            sub, leaf = path[3], path[4]
            if sub == "attn":
                if leaf in ("wq", "wk", "wv", "wo"):
                    return (d, d)
                return (d,)
            # ffn
            k0, k1 = cfg.conv_kernel_size
            h = cfg.conv_filter_size
            return {"w1": (k0, d, h), "b1": (h,), "w2": (k1, h, d), "b2": (d,),
                    "ln_g": (d,), "ln_b": (d,)}[leaf]
        # variance predictors
        f, k = cfg.vp_filter_size, cfg.vp_kernel_size
        return {"conv1_w": (k, d, f), "conv1_b": (f,),
                "conv2_w": (k, f, f), "conv2_b": (f,),
                "ln1_g": (f,), "ln1_b": (f,), "ln2_g": (f,), "ln2_b": (f,),
                "lin_w": (f, 1), "lin_b": (1,)}[leaf]

    if section == "decoder":
        b = cfg.bottleneck_dim
        blk = path[1]
        if blk.startswith("encode"):
            ci, co = ((d, b), (b, b))[int(blk[-1])]
            return {"conv1_w": (3, ci, ci), "conv1_b": (ci,),
                    "conv2_w": (3, ci, co), "conv2_b": (co,),
                    "norm1_g": (ci,), "norm1_b": (ci,),
                    "norm2_g": (ci,), "norm2_b": (ci,),
                    "conv1x1_w": (1, ci, co)}[leaf]
        if blk == "asr_res":
            r = cfg.residual_dim
            return {"conv_w": (1, d, r), "conv_b": (r,),
                    "norm_g": (r,), "norm_b": (r,)}[leaf]
        if blk.startswith("decode"):
            ci, co = decoder_block_dims(cfg)[int(blk[-1])]
            s = cfg.style_dim
            return {"fc1_w": (s, 2 * ci), "fc1_b": (2 * ci,),
                    "fc2_w": (s, 2 * co), "fc2_b": (2 * co,),
                    "conv1_w": (3, ci, co), "conv1_b": (co,),
                    "conv2_w": (3, co, co), "conv2_b": (co,),
                    "conv1x1_w": (1, ci, co)}[leaf]
        if blk == "to_out":
            return {"conv_w": (1, d, cfg.num_mels), "conv_b": (cfg.num_mels,)}[leaf]

    if section == "vocoder":
        c = cfg.hifigan_channels
        if path[1] in ("mean", "scale"):
            return (cfg.num_mels,)
        if path[1] == "input_conv_w":
            return (cfg.hifigan_kernel_size, cfg.num_mels, c)
        if path[1] == "input_conv_b":
            return (c,)
        if path[1] == "output_conv_w":
            c_last = c // (2 ** len(cfg.upsample_scales))
            return (cfg.hifigan_kernel_size, c_last, 1)
        if path[1] == "output_conv_b":
            return (1,)
        if path[1] == "upsamples":
            i = path[2]
            ci, co = vocoder_stage_channels(cfg)[i]
            if leaf == "w":
                return (cfg.upsample_kernel_sizes[i], ci, co)
            return (co,)
        if path[1] == "blocks":
            bidx = path[2]
            stage = bidx // cfg.num_resblocks
            co = vocoder_stage_channels(cfg)[stage][1]
            k = cfg.resblock_kernel_size
            if leaf == "w":
                return (k, co, co)
            return (co,)

    raise KeyError(f"unknown param path {path}")
