"""Training checkpoint save / resume tests."""

import numpy as np
import jax
import jax.numpy as jnp

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.params import init_params, load_params
from zerovox_tpu.training import (TrainBatch, TrainState, make_optimizer,
                                  train_step)
from zerovox_tpu.training.checkpoint import CheckpointManager, export_weights_gguf

CFG = TINY_CONFIG


def _batch(rng, B=2):
    return TrainBatch(
        src_seq=jnp.asarray(rng.integers(0, CFG.num_phonemes + 1,
                                         size=(B, CFG.max_n_phonemes)), jnp.int32),
        puncts=jnp.asarray(rng.integers(0, CFG.num_puncts + 1,
                                        size=(B, CFG.max_n_phonemes)), jnp.int32),
        style_embed=jnp.asarray(rng.normal(scale=0.1, size=(B, CFG.d_model)),
                                jnp.float32),
        num_phonemes=jnp.full((B,), CFG.max_n_phonemes, dtype=jnp.int32),
        durations=jnp.asarray(rng.integers(1, 4, size=(B, CFG.max_n_phonemes)),
                              jnp.int32),
        mel_target=jnp.asarray(rng.normal(size=(B, CFG.max_seq_len, CFG.num_mels)),
                               jnp.float32),
        wav_target=jnp.asarray(rng.normal(scale=0.1, size=(B, CFG.wav_len)),
                               jnp.float32),
    )


def test_save_restore_resume(tmp_path, rng):
    params = init_params(CFG, seed=0)
    opt = make_optimizer()
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(rng)

    state1, _ = train_step(state, batch, CFG, opt, use_stft=False)
    ckdir = str(tmp_path / "ckpts")
    with CheckpointManager(ckdir) as mgr:
        mgr.save(state1, wait=True)
        assert mgr.latest_step() == 1

    # resume in a "new process": fresh template, restore, next step matches
    template = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    with CheckpointManager(ckdir) as mgr2:
        restored = mgr2.restore(template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cont, _ = train_step(restored, batch, CFG, opt, use_stft=False)
    direct, _ = train_step(state1, batch, CFG, opt, use_stft=False)
    for a, b in zip(jax.tree.leaves(cont.params), jax.tree.leaves(direct.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_retention(tmp_path, rng):
    params = init_params(CFG, seed=0)
    opt = make_optimizer()
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    with CheckpointManager(str(tmp_path / "ck"), max_to_keep=2) as mgr:
        for step in (1, 2, 3, 4):
            mgr.save(state, step=step, wait=True)
        assert mgr.latest_step() == 4


def test_export_weights_gguf(tmp_path, rng):
    params = init_params(CFG, seed=0)
    opt = make_optimizer()
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    path = str(tmp_path / "served.gguf")
    export_weights_gguf(path, state, CFG)
    cfg2, params2 = load_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim == 3:
            # conv kernels are stored f16 — the reference exporter's own
            # selective cast (zv2gguf.py:156-161); ggml's conv path
            # hard-requires it, so an exported GGUF stays loadable by the
            # reference binary (caught by cli --verify)
            np.testing.assert_array_equal(a.astype(np.float16)
                                           .astype(np.float32), b)
        else:
            np.testing.assert_array_equal(a, b)
