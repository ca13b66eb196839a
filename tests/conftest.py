"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests use
XLA's forced host-platform device count (the supported way to validate
pjit/shard_map partitioning without a pod).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the config
# API wins over the plugin.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --------------------------------------------------------------------------
# Fast tier: `pytest -m quick` is the <5-min smoke subset (ops + gguf +
# attention + stage parity at TINY + a server smoke); the full suite
# (~50-55 min, no -m flag) is unchanged.  Marked here centrally so module
# files stay marker-free.
QUICK_MODULES = {
    "test_ops", "test_gguf", "test_attention_mask", "test_stages",
}
QUICK_TESTS = {
    "test_healthz", "test_synthesize_returns_wav", "test_batch_endpoint",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in QUICK_MODULES or item.name.split("[", 1)[0] in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
