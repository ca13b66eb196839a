"""Training CLI: dataset loading/validation, fit run, resume, GGUF export."""

import numpy as np
import pytest

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.params import load_params
from zerovox_tpu.training.cli import load_dataset_npz, main, synthetic_dataset

CFG = TINY_CONFIG


def test_dataset_npz_roundtrip_and_validation(tmp_path):
    data = synthetic_dataset(CFG, 4, seed=1)
    path = str(tmp_path / "d.npz")
    np.savez(path, **data._asdict())
    got = load_dataset_npz(path, CFG)
    for a, b in zip(got, data):
        np.testing.assert_array_equal(a, b)

    bad = data._asdict()
    bad["mel_target"] = bad["mel_target"][:, :-1]
    np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(SystemExit, match="mel_target"):
        load_dataset_npz(str(tmp_path / "bad.npz"), CFG)
    del bad["durations"]
    np.savez(str(tmp_path / "miss.npz"), **bad)
    with pytest.raises(SystemExit, match="durations"):
        load_dataset_npz(str(tmp_path / "miss.npz"), CFG)


def test_lr_schedule():
    """make_lr_schedule: cosine warms up linearly to the peak, decays to
    peak/10; constant+warmup holds the peak; plain constant is a float
    (all valid make_optimizer learning rates)."""
    import jax.numpy as jnp
    from zerovox_tpu.training import make_lr_schedule, make_optimizer

    s = make_lr_schedule(1e-3, 100, schedule="cosine", warmup_steps=10)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-5)

    assert make_lr_schedule(1e-3, 100) == 1e-3

    w = make_lr_schedule(1e-3, 100, warmup_steps=5)
    assert float(w(0)) == 0.0
    np.testing.assert_allclose(float(w(50)), 1e-3, rtol=1e-6)

    opt = make_optimizer(s)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_train_cli_end_to_end_and_resume(tmp_path):
    """python -m zerovox_tpu.training.cli on the virtual mesh: trains at
    TINY, checkpoints, exports a loadable GGUF — and a second invocation
    RESUMES from the saved step instead of starting over."""
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "trained.gguf")
    base = ["--synthetic", "8", "--tiny", "--epochs", "1",
            "--batch-size", "4", "--val-split", "0.25",
            "--checkpoint-dir", ck, "--checkpoint-every", "1",
            "--mesh", "4,2", "--export", out, "--seed", "3"]
    assert main(base) == 0

    cfg2, params2 = load_params(out)
    assert cfg2.max_seq_len == CFG.max_seq_len
    assert np.isfinite(np.asarray(params2["vocoder"]["input_conv_w"])).all()

    # 8 datums, batch 4, val 0.25 -> 1 train batch + 1 val batch per epoch
    from zerovox_tpu.training.checkpoint import CheckpointManager
    with CheckpointManager(ck) as mgr:
        step1 = mgr.latest_step()
    assert step1 == 1

    assert main(base) == 0               # resumes from step 1, adds 1 more
    with CheckpointManager(ck) as mgr:
        assert mgr.latest_step() == 2
