"""Stage-level numerical parity: zerovox_tpu vs torch oracles.

This is the systematised version of the reference's manual oracle testing
(SURVEY §4): each of the three stages is checked end-to-end against the
upstream PyTorch semantics with shared random weights.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.models import fs2_encoder, styletts_decoder, hifigan

from oracles import torch_ref


CFG = TINY_CONFIG


@pytest.fixture(scope="module")
def torch_models():
    torch.manual_seed(7)
    fs2 = torch_ref.TorchFS2Encoder(CFG).eval()
    dec = torch_ref.TorchStyleTTSDecoder(CFG).eval()
    voc = torch_ref.TorchHiFiGAN(CFG).eval()
    with torch.no_grad():
        voc.mean.normal_(0.0, 1.0)
        voc.scale.uniform_(0.5, 2.0)
    return fs2, dec, voc


@pytest.fixture(scope="module")
def params(torch_models):
    fs2, dec, voc = torch_models
    return {
        "encoder": torch_ref.fs2_to_params(fs2),
        "decoder": torch_ref.decoder_to_params(dec),
        "vocoder": torch_ref.hifigan_to_params(voc),
    }


def test_fs2_encoder_parity(torch_models, params, rng):
    fs2, _, _ = torch_models
    B, P = 2, CFG.max_n_phonemes
    src = rng.integers(0, CFG.num_phonemes + 1, size=(B, P))
    pun = rng.integers(0, CFG.num_puncts + 1, size=(B, P))
    style = rng.normal(scale=0.1, size=(B, CFG.d_model)).astype(np.float32)

    with torch.no_grad():
        ref_feat, ref_dur = fs2(torch.from_numpy(src), torch.from_numpy(pun),
                                torch.from_numpy(style))

    feat, dur = fs2_encoder.encode(params, CFG, jnp.asarray(src),
                                   jnp.asarray(pun), jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(dur), ref_dur.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_styletts_decoder_parity(torch_models, params, rng):
    _, dec, _ = torch_models
    B, T = 2, CFG.max_seq_len
    hidden = rng.normal(size=(B, T, CFG.d_model)).astype(np.float32)
    style = rng.normal(scale=0.1, size=(B, CFG.d_model)).astype(np.float32)

    with torch.no_grad():
        ref = dec(torch.from_numpy(hidden), torch.from_numpy(style))

    got = styletts_decoder.decode(params, CFG, jnp.asarray(hidden),
                                  jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_hifigan_parity(torch_models, params, rng):
    _, _, voc = torch_models
    B, T = 2, 32
    mel = rng.normal(size=(B, T, CFG.num_mels)).astype(np.float32)

    with torch.no_grad():
        ref = voc(torch.from_numpy(mel))

    got = hifigan.vocode(params, CFG, jnp.asarray(mel))
    assert got.shape == (B, T * CFG.hop_size)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_hifigan_output_length_per_stage(params, rng):
    """Each upsample stage must multiply length exactly by its scale
    (wav = T * hop, /root/reference/src/zerovox.cpp:369)."""
    mel = rng.normal(size=(1, 17, CFG.num_mels)).astype(np.float32)
    wav = hifigan.vocode(params, CFG, jnp.asarray(mel))
    assert wav.shape == (1, 17 * CFG.hop_size)
