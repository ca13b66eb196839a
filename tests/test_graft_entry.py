"""Driver-contract test: dryrun_multichip must self-provision its mesh.

Round 1's MULTICHIP artifact failed because the driver calls
``dryrun_multichip(8)`` directly (``python -c "import __graft_entry__; ..."``)
on a host whose JAX sees one real TPU — the function must create its own
virtual 8-device CPU mesh.  This test reproduces the driver's invocation
exactly, in a subprocess, WITHOUT pre-setting XLA_FLAGS or JAX_PLATFORMS.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    """Environment as the driver would have it: no virtual-mesh flags."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("_ZV_DRYRUN_SUBPROC", None)
    return env


def test_dryrun_multichip_as_driver_calls_it():
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_scrubbed_env(), cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"driver-style dryrun failed:\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_multichip_after_backend_init():
    """If the backend initialized first (too few devices), the subprocess
    fallback must still complete the dryrun."""
    import pytest
    # this test must initialize the REAL default backend first; when that
    # backend is a tunnel-attached TPU and the tunnel is down, jax.devices()
    # hangs — an environment outage, not a code regression, so probe
    # cheaply and skip rather than fail
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env=_scrubbed_env(), cwd=REPO, capture_output=True,
            timeout=120, check=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        pytest.skip("default JAX backend unreachable (TPU tunnel down)")
    code = (
        "import jax; jax.devices();"  # lock in whatever platform is default
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_scrubbed_env(), cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"post-init dryrun failed:\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    assert "dryrun_multichip OK" in proc.stdout
