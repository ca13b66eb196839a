"""End-to-end pipeline tests: shapes, jit, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from zerovox_tpu.config import TINY_CONFIG, ZeroVoxConfig
from zerovox_tpu.models.pipeline import synthesize, jit_synthesize
from zerovox_tpu.params import (init_params, load_params, save_params,
                                params_from_arrays, params_to_arrays)

CFG = TINY_CONFIG


def _inputs(rng, B=2):
    src = jnp.asarray(rng.integers(0, CFG.num_phonemes + 1,
                                   size=(B, CFG.max_n_phonemes)))
    pun = jnp.asarray(rng.integers(0, CFG.num_puncts + 1,
                                   size=(B, CFG.max_n_phonemes)))
    style = jnp.asarray(rng.normal(scale=0.1, size=(B, CFG.d_model)),
                        dtype=jnp.float32)
    return src, pun, style


def test_synthesize_shapes(rng):
    params = init_params(CFG, seed=0)
    src, pun, style = _inputs(rng)
    res = synthesize(params, CFG, src, pun, style)
    B = src.shape[0]
    assert res.wav.shape == (B, CFG.max_seq_len * CFG.hop_size)
    assert res.mel.shape == (B, CFG.max_seq_len, CFG.num_mels)
    assert res.mel_len.shape == (B,)
    assert res.log_duration.shape == (B, CFG.max_n_phonemes)
    assert np.all(np.isfinite(np.asarray(res.wav)))
    assert np.all(np.asarray(res.wav) <= 1.0) and np.all(np.asarray(res.wav) >= -1.0)


def test_jit_matches_eager(rng):
    params = init_params(CFG, seed=0)
    src, pun, style = _inputs(rng, B=1)
    eager = synthesize(params, CFG, src, pun, style)
    fn = jit_synthesize(params, CFG)
    jitted = fn(params, src, pun, style)
    np.testing.assert_allclose(np.asarray(jitted.wav), np.asarray(eager.wav),
                               atol=1e-5, rtol=1e-5)


def test_zero_pad_tail_is_silent(rng):
    """Frames past mel_len get zero hidden features (reference zero-pads the
    tail, src/fs2encoder.cpp:614)."""
    params = init_params(CFG, seed=0)
    src, pun, style = _inputs(rng, B=1)
    res = synthesize(params, CFG, src, pun, style, num_phonemes=jnp.asarray([4]))
    # with only 4 phonemes, mel_len should be well below max
    assert int(res.mel_len[0]) <= CFG.max_seq_len


def test_num_phonemes_masks_durations(rng):
    params = init_params(CFG, seed=0)
    src, pun, style = _inputs(rng, B=1)
    full = synthesize(params, CFG, src, pun, style)
    limited = synthesize(params, CFG, src, pun, style,
                         num_phonemes=jnp.asarray([3]))
    assert int(limited.mel_len[0]) <= int(full.mel_len[0])


def test_gguf_checkpoint_roundtrip(tmp_path, rng):
    """save_params -> load_params: the loader inverts every layout
    transform; conv kernels are stored f16 (the reference exporter's own
    cast, required by ggml's conv path — see save_params), so fresh f32
    weights round-trip within f16 quantisation and a SECOND round trip is
    bit-exact (f16 fixpoint)."""
    params = init_params(CFG, seed=3)
    path = str(tmp_path / "ckpt.gguf")
    save_params(path, params, CFG)

    cfg2, params2 = load_params(path)
    assert cfg2.max_seq_len == CFG.max_seq_len
    assert cfg2.hop_size == CFG.hop_size

    src, pun, style = _inputs(rng, B=1)
    a = synthesize(params, CFG, src, pun, style)
    b = synthesize(params2, CFG, src, pun, style)
    np.testing.assert_allclose(np.asarray(a.wav), np.asarray(b.wav),
                               atol=2e-3, rtol=1e-3)

    path2 = str(tmp_path / "ckpt2.gguf")
    save_params(path2, params2, CFG)
    _, params3 = load_params(path2)
    c = synthesize(params3, CFG, src, pun, style)
    np.testing.assert_array_equal(np.asarray(b.wav), np.asarray(c.wav))


def test_arrays_roundtrip():
    """params -> gguf arrays -> params is the identity."""
    params = init_params(CFG, seed=5)
    arrays = params_to_arrays(params, CFG)
    params2 = params_from_arrays(arrays, CFG)
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_json_roundtrip():
    s = CFG.to_json()
    cfg2 = ZeroVoxConfig.from_json(s)
    assert cfg2 == CFG


def test_config_gguf_kv_roundtrip():
    kv = CFG.to_gguf_kv()
    cfg2 = ZeroVoxConfig.from_gguf_kv(
        kv,
        num_phonemes=CFG.num_phonemes, num_puncts=CFG.num_puncts,
        max_n_phonemes=CFG.max_n_phonemes, residual_dim=CFG.residual_dim,
        hifigan_channels=CFG.hifigan_channels,
        upsample_scales=CFG.upsample_scales,
        upsample_kernel_sizes=CFG.upsample_kernel_sizes,
        num_resblocks=CFG.num_resblocks,
        resblock_dilations=CFG.resblock_dilations)
    assert cfg2 == CFG


def test_quantized_checkpoint(tmp_path, rng):
    """save_params(quantize='q8_0') -> smaller file, output within q8 tolerance."""
    import os
    params = init_params(CFG, seed=3)
    p32 = str(tmp_path / "f32.gguf")
    pq8 = str(tmp_path / "q8.gguf")
    save_params(p32, params, CFG)
    save_params(pq8, params, CFG, quantize="q8_0")
    assert os.path.getsize(pq8) < 0.6 * os.path.getsize(p32)

    _, params_q = load_params(pq8)
    # the duration path is discrete (rounding) so e2e mels can shift by whole
    # frames under quantization; compare the continuous vocoder path instead
    from zerovox_tpu.models import hifigan
    mel = jnp.asarray(rng.normal(size=(1, 16, CFG.num_mels)), jnp.float32)
    wa = hifigan.vocode(params, CFG, mel)
    wq = hifigan.vocode(params_q, CFG, mel)
    np.testing.assert_allclose(np.asarray(wq), np.asarray(wa), atol=0.05)

    src, pun, style = _inputs(rng, B=1)
    b = synthesize(params_q, CFG, src, pun, style)
    assert np.isfinite(np.asarray(b.wav)).all()
