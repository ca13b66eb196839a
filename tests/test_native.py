"""Native C++ library: GGUF fast path + WAV writer vs pure-Python reference."""

import numpy as np
import pytest

from zerovox_tpu.io import native
from zerovox_tpu.io.gguf import GGUFReader, GGUFWriter, GGMLType
from zerovox_tpu.io.wav import read_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture
def sample_gguf(tmp_path, rng):
    w = GGUFWriter(arch="zerovox-resnet-fs2-styletts")
    w.add_uint32("zerovox-resnet-fs2-styletts.max_seq_len", 64)
    arrays = {
        "a.f32": rng.normal(size=(5, 7)).astype(np.float32),
        "b.f16": rng.normal(size=(3, 4, 2)).astype(np.float16),
        "c.i32": rng.integers(0, 100, size=(9,)).astype(np.int32),
    }
    for n, a in arrays.items():
        w.add_tensor(n, a)
    w.add_tensor("d.bf16", rng.normal(size=(4, 4)).astype(np.float32),
                 ggml_type=GGMLType.BF16)
    path = str(tmp_path / "x.gguf")
    w.write(path)
    return path, arrays


def test_native_matches_python_reader(sample_gguf):
    path, arrays = sample_gguf
    with native.NativeGGUF(path) as ng, GGUFReader(path) as pr:
        assert set(ng.tensor_names()) == set(pr.tensor_names())
        for name in arrays:
            np.testing.assert_array_equal(ng.get(name), pr.get(name))
        # f16 widening path bit-matches numpy's astype
        np.testing.assert_array_equal(ng.get("b.f16", as_float32=True),
                                      pr.get("b.f16", as_float32=True))
        np.testing.assert_array_equal(ng.get("d.bf16"), pr.get("d.bf16"))


def test_native_missing_tensor(sample_gguf):
    path, _ = sample_gguf
    with native.NativeGGUF(path) as ng:
        with pytest.raises(KeyError):
            ng.get("nonexistent")


def test_native_rejects_corrupt(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOTGGUF" + b"\x00" * 100)
    with pytest.raises(ValueError):
        native.NativeGGUF(str(p))


def test_native_rejects_truncated(sample_gguf, tmp_path):
    path, _ = sample_gguf
    data = open(path, "rb").read()
    p = tmp_path / "trunc.gguf"
    p.write_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError):
        native.NativeGGUF(str(p))


def test_native_wav_matches_python(tmp_path):
    wav = (np.sin(np.linspace(0, 100, 4800)) * 0.9).astype(np.float32)
    p_native = str(tmp_path / "n.wav")
    assert native.write_wav_native(p_native, wav, 24000)
    got, rate = read_wav(p_native)
    assert rate == 24000
    np.testing.assert_allclose(got, wav, atol=1.0 / 32000)


def test_f16_special_values(tmp_path):
    """Native f16 widening must handle subnormals, inf, nan, zeros."""
    vals = np.array([0.0, -0.0, 1.0, -2.5, 6e-8, -6e-8, 65504.0, np.inf,
                     -np.inf, np.nan], dtype=np.float16)
    w = GGUFWriter()
    w.add_tensor("x", vals)
    path = str(tmp_path / "s.gguf")
    w.write(path)
    with native.NativeGGUF(path) as ng:
        got = ng.get("x", as_float32=True)
    ref = vals.astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    m = ~np.isnan(ref)
    np.testing.assert_array_equal(got[m], ref[m])
