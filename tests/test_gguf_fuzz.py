"""GGUF reader robustness: corrupt/hostile checkpoints must fail closed.

The sanctioned failure family (load_params docstring, verify recipe) is
ValueError (incl. UnicodeDecodeError) / EOFError / KeyError /
NotImplementedError.  A daemon loading an attacker-supplied or
disk-corrupted checkpoint must hit one of those — never a hang, a
RecursionError, a struct.error, or silent truncation.  The reference's
parser aborts the process on corrupt input (ggml's GGML_ASSERT); failing
with a typed Python exception is the resident-server equivalent.

Three legs: a byte-flip sweep over the metadata section, a truncation
sweep, and hand-crafted pathological headers (deep ARRAY nesting,
negative section counts).  The same corrupt files are also fed to the
native mmap reader when it is available (it signals via ValueError).
"""

import struct

import numpy as np
import pytest

from zerovox_tpu.io.gguf import (GGUF_MAGIC, GGUFReader, GGUFWriter,
                                 GGUFValueType)

SANCTIONED = (ValueError, EOFError, KeyError, NotImplementedError)


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    """A small but structurally rich GGUF: kv scalars, strings, arrays,
    several tensor dtypes, non-trivial alignment padding."""
    path = str(tmp_path_factory.mktemp("fuzz") / "s.gguf")
    rng = np.random.default_rng(0)
    w = GGUFWriter()
    w.add_kv("gen.name", "fuzz-sample")
    w.add_kv("gen.count", 3)
    w.add_kv("gen.scale", 0.25)
    w.add_kv("gen.flag", True)
    w.add_kv("gen.arr", [1, 2, 3, 4])
    w.add_tensor("a.weight", rng.normal(size=(8, 12)).astype(np.float32))
    w.add_tensor("b.weight", rng.normal(size=(4, 6)).astype(np.float16))
    w.add_tensor("c.idx", np.arange(10, dtype=np.int32))
    w.write(path)
    return path


def _read_everything(path):
    r = GGUFReader(path)
    for k in r.kv:
        _ = r.kv[k]
    for name in r.tensor_names():
        raw = r.get_raw(name)
        _ = bytes(raw[:16])
        arr = r.get(name, as_float32=True)
        np.asarray(arr).sum()
    return r


def _mutate(tmp_path, src_bytes, pos, val):
    p = tmp_path / f"m_{pos}_{val}.gguf"
    b = bytearray(src_bytes)
    b[pos] = val
    p.write_bytes(bytes(b))
    return str(p)


def test_byteflip_sweep_metadata(sample, tmp_path):
    """Flip every byte of the metadata section (to 0xFF and 0x00): the
    reader either still succeeds (benign flip, e.g. inside a string) or
    raises a sanctioned error — nothing else escapes."""
    src = open(sample, "rb").read()
    r = GGUFReader(sample)
    meta_end = r.data_offset
    outcomes = {"ok": 0, "typed": 0}
    for pos in range(meta_end):
        for val in (0xFF, 0x00):
            if src[pos] == val:
                continue
            p = _mutate(tmp_path, src, pos, val)
            try:
                _read_everything(p)
                outcomes["ok"] += 1
            except SANCTIONED:
                outcomes["typed"] += 1
            # anything else (RecursionError, struct.error, MemoryError,
            # hang) propagates and fails the test
    # sanity: the sweep actually exercised both outcomes
    assert outcomes["typed"] > 50
    assert outcomes["ok"] > 10


def test_truncation_sweep(sample, tmp_path):
    src = open(sample, "rb").read()
    r = GGUFReader(sample)
    cuts = sorted({0, 1, 3, 4, 8, 12, 16, 24, 40,
                   r.data_offset // 2, r.data_offset - 1, r.data_offset,
                   r.data_offset + 7, len(src) - 1})
    for cut in cuts:
        p = tmp_path / f"t_{cut}.gguf"
        p.write_bytes(src[:cut])
        with pytest.raises(SANCTIONED):
            _read_everything(str(p))


def _header(n_tensors, n_kv):
    return struct.pack("<IIqq", GGUF_MAGIC, 3, n_tensors, n_kv)


def test_negative_section_counts(tmp_path):
    for nt, nk in ((-1, 0), (0, -1), (-(1 << 40), 2)):
        p = tmp_path / f"neg_{nt}_{nk}.gguf"
        p.write_bytes(_header(nt, nk) + b"\x00" * 64)
        with pytest.raises(ValueError, match="negative section count"):
            GGUFReader(str(p))


def test_deep_array_nesting_is_valueerror(tmp_path):
    """ARRAY-of-ARRAY nested 5000 deep: must be a typed ValueError (depth
    cap), not a RecursionError escaping the sanctioned family."""
    depth = 5000
    body = struct.pack("<Q", 1) + b"k"          # key "k"
    body += struct.pack("<i", GGUFValueType.ARRAY)
    for _ in range(depth):
        # elem_type=ARRAY, count=1 -> recurse
        body += struct.pack("<iQ", GGUFValueType.ARRAY, 1)
    body += struct.pack("<iQ", GGUFValueType.UINT8, 0)
    p = tmp_path / "deep.gguf"
    p.write_bytes(_header(0, 1) + body)
    with pytest.raises(ValueError, match="nesting"):
        GGUFReader(str(p))


def test_huge_string_length_is_bounded(tmp_path):
    """A string length of 2^62 must raise EOFError promptly, not attempt
    a 4-exbibyte allocation."""
    body = struct.pack("<Q", 1 << 62) + b"x"
    p = tmp_path / "bigstr.gguf"
    p.write_bytes(_header(0, 1) + body)
    with pytest.raises(SANCTIONED):
        GGUFReader(str(p))


def test_tensor_overflowing_extents(sample, tmp_path):
    """Rewrite the first tensor's ne[0] to 2^48: reading data must fail
    typed (extent beyond file), not wrap or crash."""
    r = GGUFReader(sample)
    src = bytearray(open(sample, "rb").read())
    # locate the tensor-info section: re-parse manually up to the first
    # tensor name, then patch its first ne entry
    name = r.tensor_names()[0].encode()
    i = src.find(struct.pack("<Q", len(name)) + name)
    assert i > 0
    ne_pos = i + 8 + len(name) + 4              # skip len, name, n_dims
    src[ne_pos:ne_pos + 8] = struct.pack("<Q", 1 << 48)
    p = tmp_path / "bigne.gguf"
    p.write_bytes(bytes(src))
    with pytest.raises(SANCTIONED):
        _read_everything(str(p))


def test_native_reader_rejects_same_corpus(sample, tmp_path):
    """The native mmap reader fails closed (ValueError) on the crafted
    corpus too; skipped when the native lib can't build here."""
    from zerovox_tpu.io import native
    if not native.available():
        pytest.skip("native library unavailable")
    src = open(sample, "rb").read()
    r = GGUFReader(sample)
    cases = []
    for cut in (3, 12, 40, r.data_offset - 1):
        p = tmp_path / f"nt_{cut}.gguf"
        p.write_bytes(src[:cut])
        cases.append(str(p))
    p = tmp_path / "nneg.gguf"
    p.write_bytes(_header(-1, 0) + b"\x00" * 64)
    cases.append(str(p))
    for path in cases:
        with pytest.raises((ValueError, KeyError, EOFError)):
            reader = native.NativeGGUF(path)
            for n in reader.tensor_names():
                reader.get(n)
