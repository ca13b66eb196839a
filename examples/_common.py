"""Shared example plumbing: backend/config/parameter selection.

Every example calls `setup(argv)` FIRST — before importing anything that
pulls in jax-dependent model code — because forcing the CPU backend and
the virtual multi-device mesh must happen around jax import time
(CLAUDE.md: the axon plugin overrides JAX_PLATFORMS; the device-count
flag is read once at backend init)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup(argv=None, need_devices: int = 1, extra_args=()):
    """Parse common flags, configure the backend, return (args, cfg, params).

    --cpu: force the CPU backend (TINY config, random weights) — the
      fast, hardware-independent path the example tests use.
    --model: load a real GGUF checkpoint (production config).
    """
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend + TINY config (fast demo)")
    ap.add_argument("--model", default=None, help="GGUF checkpoint path")
    ap.add_argument("--out-dir", default="/tmp", help="output directory")
    for flag, kw in extra_args:
        ap.add_argument(flag, **kw)
    args = ap.parse_args(argv)

    if args.cpu and need_devices > 1:
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={need_devices}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu import TINY_CONFIG, init_params, load_params
    if args.model:
        cfg, params = load_params(args.model)
    else:
        cfg = TINY_CONFIG if args.cpu else None
        if cfg is None:
            from zerovox_tpu import ZeroVoxConfig
            cfg = ZeroVoxConfig()       # production geometry, random weights
        params = init_params(cfg, seed=0)
    return args, cfg, params


def demo_utterance(cfg, seed: int = 0, batch: int = 1):
    """A reproducible random utterance (ids + style vector)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    src = rng.integers(1, cfg.num_phonemes + 1,
                       size=(batch, cfg.max_n_phonemes)).astype(np.int32)
    pun = rng.integers(0, cfg.num_puncts + 1,
                       size=(batch, cfg.max_n_phonemes)).astype(np.int32)
    style = rng.normal(scale=0.1, size=(batch, cfg.d_model)).astype(np.float32)
    return src, pun, style
