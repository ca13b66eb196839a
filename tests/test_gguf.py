"""GGUF reader/writer round-trip tests (replaces ggml's C gguf layer)."""

import numpy as np
import pytest

from zerovox_tpu.io.gguf import (GGUFReader, GGUFWriter, GGMLType,
                                 GGUFValueType, bf16_to_f32, f32_to_bf16_u16)


def test_roundtrip_kv_and_tensors(tmp_path, rng):
    w = GGUFWriter(arch="zerovox-resnet-fs2-styletts")
    w.add_uint32("zerovox-resnet-fs2-styletts.max_seq_len", 1500)
    w.add_kv("some.string", "hello world")
    w.add_kv("some.float", 3.5)
    w.add_kv("some.bool", True)
    w.add_kv("some.int_list", [1, 2, 3])
    w.add_kv("some.str_list", ["a", "bc"])

    a = rng.normal(size=(7, 5)).astype(np.float32)
    b = rng.normal(size=(3, 4, 9)).astype(np.float16)
    c = rng.integers(0, 100, size=(11,)).astype(np.int32)
    w.add_tensor("tensor.a", a)
    w.add_tensor("tensor.b", b)
    w.add_tensor("tensor.c", c)

    path = str(tmp_path / "test.gguf")
    w.write(path)

    with GGUFReader(path) as r:
        assert r.kv["general.architecture"] == "zerovox-resnet-fs2-styletts"
        assert r.kv["zerovox-resnet-fs2-styletts.max_seq_len"] == 1500
        assert r.kv["some.string"] == "hello world"
        assert r.kv["some.float"] == pytest.approx(3.5)
        assert r.kv["some.bool"] is True
        assert r.kv["some.int_list"] == [1, 2, 3]
        assert r.kv["some.str_list"] == ["a", "bc"]

        assert r.tensors["tensor.a"].ggml_type == GGMLType.F32
        assert r.tensors["tensor.b"].ggml_type == GGMLType.F16
        assert r.tensors["tensor.c"].ggml_type == GGMLType.I32
        # ggml ne order is reversed numpy shape
        assert r.tensors["tensor.b"].ne == (9, 4, 3)

        np.testing.assert_array_equal(r.get("tensor.a"), a)
        np.testing.assert_array_equal(r.get("tensor.b"), b)
        np.testing.assert_array_equal(r.get("tensor.c"), c)
        assert r.get("tensor.b", as_float32=True).dtype == np.float32


def test_alignment(tmp_path, rng):
    """Every tensor must start at a 32-byte-aligned offset (GGUF spec)."""
    w = GGUFWriter()
    w.add_tensor("x", rng.normal(size=(3,)).astype(np.float32))   # 12 bytes
    w.add_tensor("y", rng.normal(size=(5,)).astype(np.float32))
    path = str(tmp_path / "align.gguf")
    w.write(path)
    with GGUFReader(path) as r:
        for name in ("x", "y"):
            assert (r.data_offset + r.tensors[name].offset) % 32 == 0
        np.testing.assert_array_equal(r.get("y").shape, (5,))


def test_bf16(tmp_path, rng):
    x = rng.normal(size=(4, 6)).astype(np.float32)
    w = GGUFWriter()
    w.add_tensor("x", x, ggml_type=GGMLType.BF16)
    path = str(tmp_path / "bf16.gguf")
    w.write(path)
    with GGUFReader(path) as r:
        got = r.get("x")
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, x, rtol=1e-2, atol=1e-2)


def test_bf16_conversion_exact():
    x = np.array([1.0, -2.0, 0.5, 65280.0], dtype=np.float32)
    u = f32_to_bf16_u16(x)
    np.testing.assert_array_equal(bf16_to_f32(u), x)  # exactly representable


def test_q8_0_roundtrip(tmp_path, rng):
    """Q8_0 quantize -> write -> read -> dequantize within 1/127 relative."""
    from zerovox_tpu.io.gguf import quantize_q8_0, dequantize_q8_0
    x = rng.normal(size=(4, 64)).astype(np.float32)
    raw = quantize_q8_0(x)
    deq = dequantize_q8_0(np.frombuffer(raw, dtype=np.uint8), x.size).reshape(x.shape)
    scale = np.abs(x).reshape(-1, 32).max(axis=1).repeat(32).reshape(x.shape)
    np.testing.assert_allclose(deq, x, atol=(scale / 127.0 * 0.51 + 1e-8).max())

    w = GGUFWriter()
    w.add_tensor("q", x, ggml_type=GGMLType.Q8_0)
    path = str(tmp_path / "q8.gguf")
    w.write(path)
    with GGUFReader(path) as r:
        assert r.tensors["q"].ggml_type == GGMLType.Q8_0
        np.testing.assert_allclose(r.get("q"), deq, atol=1e-7)


def test_q4_0_dequant_known_values():
    """Hand-built Q4_0 block: x_i = (nib_i - 8) * scale, low nibbles first."""
    from zerovox_tpu.io.gguf import dequantize_q4_0
    import struct
    scale = 0.5
    nibs = bytes([(9 | (7 << 4))] * 16)     # lo=9 -> +1, hi=7 -> -1
    raw = np.frombuffer(struct.pack("<e", scale) + nibs, dtype=np.uint8)
    out = dequantize_q4_0(raw, 32)
    np.testing.assert_allclose(out[:16], 0.5)
    np.testing.assert_allclose(out[16:], -0.5)
