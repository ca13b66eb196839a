"""Every examples/ script runs green on --cpu (TINY, seconds each).

Subprocess runs: the examples manage their own backend setup (forcing
CPU / virtual mesh around jax import), so they must work from a clean
interpreter, not the test process's already-initialized jax.
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(os.path.dirname(__file__), "..",
                                       "examples"))
    if f.endswith(".py") and f[0].isdigit())


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script, tmp_path):
    path = os.path.join(os.path.dirname(__file__), "..", "examples", script)
    r = subprocess.run(
        [sys.executable, path, "--cpu", "--out-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(path))
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    assert r.stdout.strip(), f"{script} printed nothing"


def test_examples_list_is_complete():
    # the README table and the directory stay in sync
    readme = open(os.path.join(os.path.dirname(__file__), "..",
                               "examples", "README.md")).read()
    for script in EXAMPLES:
        assert script in readme, f"{script} missing from examples/README.md"
