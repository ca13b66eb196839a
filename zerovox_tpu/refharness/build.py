"""Build-and-load machinery for the ggml differential harness.

Builds the VENDORED ggml runtime (<reference>/ggml, CPU backend only)
into a per-repo cache once, compiles refharness/harness.c against it,
and exposes the result as a ctypes library.  Everything is best-effort:
callers get (None, reason) when the toolchain or the reference tree is
unavailable; the differential tests skip and `cli --verify` reports why.

The reference tree root defaults to /root/reference and can be pointed
elsewhere with the ZEROVOX_REF environment variable (it is read-only and
ships without ggml.pc.in / tests / examples; a symlink shadow tree
supplies the missing stubs).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
from pathlib import Path
from typing import Optional, Tuple

_REF_ROOT = Path(os.environ.get("ZEROVOX_REF", "/root/reference"))
REF_GGML = _REF_ROOT / "ggml"
REF_SRC = _REF_ROOT / "src"
CACHE = Path(__file__).resolve().parents[2] / ".cache"
SRC_SHADOW = CACHE / "ggml-src"
BUILD = CACHE / "ggml-build"
HARNESS_C = Path(__file__).resolve().parent / "harness.c"
HARNESS_SO = CACHE / "zv_ggml_harness.so"
STAGE_CPP = Path(__file__).resolve().parent / "stage_harness.cpp"
STAGE_SO = CACHE / "zv_ggml_stages.so"
ZEROMALLOC_C = Path(__file__).resolve().parent / "zeromalloc.c"
ZEROMALLOC_SO = CACHE / "zv_zeromalloc.so"
# the reference's own stage classes, compiled unmodified as the diff subject
STAGE_REF_SOURCES = ("fs2encoder.cpp", "stylettsdec.cpp", "hifigan.cpp",
                     "utils.cpp")

_cached: Optional[Tuple[Optional[ctypes.CDLL], str]] = None
_stage_cached: Optional[Tuple[Optional[ctypes.CDLL], str]] = None


def _run(cmd, timeout=600):
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)


def _shadow_tree():
    if not (SRC_SHADOW / "CMakeLists.txt").exists():
        SRC_SHADOW.parent.mkdir(parents=True, exist_ok=True)
        shutil.rmtree(SRC_SHADOW, ignore_errors=True)
        # symlink farm: sources stay in the read-only reference tree
        subprocess.run(["cp", "-rs", str(REF_GGML), str(SRC_SHADOW)],
                       check=True)
    pc = SRC_SHADOW / "ggml.pc.in"
    if not pc.exists():
        pc.write_text("prefix=@CMAKE_INSTALL_PREFIX@\nName: ggml\n"
                      "Description: ggml\nVersion: @GGML_INSTALL_VERSION@\n")
    for d in ("tests", "examples"):
        (SRC_SHADOW / d).mkdir(exist_ok=True)


def _build_ggml() -> Optional[str]:
    """Returns None on success, else the failure reason."""
    libs = [BUILD / "src" / n
            for n in ("libggml-base.so", "libggml-cpu.so")]
    if all(p.exists() for p in libs):
        return None
    if not REF_GGML.exists():
        return "reference ggml tree not available"
    if not shutil.which("cmake") or not shutil.which("ninja"):
        return "cmake/ninja not available"
    try:
        _shadow_tree()
        r = _run(["cmake", "-S", str(SRC_SHADOW), "-B", str(BUILD),
                  "-G", "Ninja", "-DBUILD_SHARED_LIBS=ON", "-DGGML_CPU=ON",
                  "-DGGML_BUILD_TESTS=OFF", "-DGGML_BUILD_EXAMPLES=OFF",
                  "-DCMAKE_BUILD_TYPE=Release"])
        if r.returncode:
            return f"cmake configure failed: {r.stderr[-400:]}"
        r = _run(["ninja", "-C", str(BUILD)])
        if r.returncode:
            return f"ninja failed: {r.stderr[-400:]}"
    except (subprocess.TimeoutExpired, OSError) as e:
        return f"ggml build error: {e}"
    if not all(p.exists() for p in libs):
        return "ggml build produced no libraries"
    return None


def _build_harness() -> Optional[str]:
    if (HARNESS_SO.exists()
            and HARNESS_SO.stat().st_mtime >= HARNESS_C.stat().st_mtime):
        return None
    cc = shutil.which("cc") or shutil.which("gcc")
    if not cc:
        return "no C compiler"
    libdir = BUILD / "src"
    r = _run([cc, "-shared", "-fPIC", "-O2",
              "-I", str(REF_GGML / "include"), str(HARNESS_C),
              "-o", str(HARNESS_SO), "-L", str(libdir),
              "-lggml-cpu", "-lggml-base", f"-Wl,-rpath,{libdir}"])
    if r.returncode:
        return f"harness compile failed: {r.stderr[-400:]}"
    return None


def _declare(lib: ctypes.CDLL):
    i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    c_int, c_float = ctypes.c_int, ctypes.c_float
    lib.zv_ggml_norm.argtypes = [f32p, i64, i64, c_float, f32p]
    lib.zv_ggml_norm.restype = c_int
    lib.zv_ggml_soft_max.argtypes = [f32p, i64, i64, f32p]
    lib.zv_ggml_soft_max.restype = c_int
    lib.zv_ggml_mul_mat.argtypes = [f32p, i64, i64, c_int, f32p, i64, f32p]
    lib.zv_ggml_mul_mat.restype = c_int
    lib.zv_ggml_conv_1d.argtypes = [f32p, i64, i64, i64, c_int, f32p, i64,
                                    c_int, c_int, c_int, f32p]
    lib.zv_ggml_conv_1d.restype = c_int
    lib.zv_ggml_conv_transpose_1d_ref.argtypes = [
        f32p, i64, i64, i64, c_int, f32p, i64, c_int, c_int, c_int, f32p]
    lib.zv_ggml_conv_transpose_1d_ref.restype = c_int
    lib.zv_ggml_conv_out_len.argtypes = [i64, i64, c_int, c_int, c_int]
    lib.zv_ggml_conv_out_len.restype = i64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.zv_ggml_quantize.argtypes = [c_int, f32p, u8p, i64, i64]
    lib.zv_ggml_quantize.restype = i64
    lib.zv_ggml_quantize_row.argtypes = [c_int, f32p, u8p, i64]
    lib.zv_ggml_quantize_row.restype = c_int
    lib.zv_ggml_dequantize.argtypes = [c_int, u8p, f32p, i64]
    lib.zv_ggml_dequantize.restype = c_int


def _build_stage_harness() -> Optional[str]:
    ref_srcs = [REF_SRC / n for n in STAGE_REF_SOURCES]
    if not all(p.exists() for p in ref_srcs):
        return "reference src tree not available"
    newest_dep = max(p.stat().st_mtime for p in ref_srcs + [STAGE_CPP])
    if STAGE_SO.exists() and STAGE_SO.stat().st_mtime >= newest_dep:
        return None
    cxx = shutil.which("g++") or shutil.which("c++")
    if not cxx:
        return "no C++ compiler"
    libdir = BUILD / "src"
    r = _run([cxx, "-std=c++17", "-shared", "-fPIC", "-O2",
              "-I", str(REF_GGML / "include"), "-I", str(REF_SRC),
              str(STAGE_CPP), *[str(p) for p in ref_srcs],
              "-o", str(STAGE_SO), "-L", str(libdir),
              "-lggml-cpu", "-lggml-base", f"-Wl,-rpath,{libdir}"])
    if r.returncode:
        return f"stage harness compile failed: {r.stderr[-600:]}"
    return None


def get_zeromalloc() -> Optional[str]:
    """Build (once) and return the LD_PRELOAD zeroing-allocator path for
    the stage worker, or None when it cannot be built (the worker then
    runs without it — the differential tests may flake on the reference's
    uninitialized-memory reads; see zeromalloc.c)."""
    if (ZEROMALLOC_SO.exists()
            and ZEROMALLOC_SO.stat().st_mtime >= ZEROMALLOC_C.stat().st_mtime):
        return str(ZEROMALLOC_SO)
    cc = shutil.which("cc") or shutil.which("gcc")
    if not cc:
        return None
    ZEROMALLOC_SO.parent.mkdir(parents=True, exist_ok=True)
    r = _run([cc, "-shared", "-fPIC", "-O2", str(ZEROMALLOC_C),
              "-o", str(ZEROMALLOC_SO)])
    return str(ZEROMALLOC_SO) if r.returncode == 0 else None


def _declare_stages(lib: ctypes.CDLL):
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    c_int, c_u32 = ctypes.c_int, ctypes.c_uint32
    lib.zv_stages_load.argtypes = [ctypes.c_char_p, u32p, i32p, c_int,
                                   i64p, c_int, c_int]
    lib.zv_stages_load.restype = c_int
    lib.zv_stages_encoder.argtypes = [i32p, i32p, f32p, c_u32, f32p]
    lib.zv_stages_encoder.restype = c_u32
    lib.zv_stages_decoder.argtypes = [f32p, f32p, f32p]
    lib.zv_stages_decoder.restype = c_int
    lib.zv_stages_hifigan.argtypes = [f32p, f32p]
    lib.zv_stages_hifigan.restype = c_int
    lib.zv_stages_free.argtypes = []
    lib.zv_stages_free.restype = None


def get_stage_harness() -> Tuple[Optional[ctypes.CDLL], str]:
    """Reference-stage-class harness: (lib, "") or (None, reason)."""
    global _stage_cached
    if _stage_cached is not None:
        return _stage_cached
    reason = _build_ggml() or _build_stage_harness()
    if reason:
        _stage_cached = (None, reason)
        return _stage_cached
    try:
        lib = ctypes.CDLL(str(STAGE_SO))
        _declare_stages(lib)
    except OSError as e:
        _stage_cached = (None, f"dlopen failed: {e}")
        return _stage_cached
    _stage_cached = (lib, "")
    return _stage_cached


def get_harness() -> Tuple[Optional[ctypes.CDLL], str]:
    """(lib, "") on success, (None, reason) otherwise.  Cached per process."""
    global _cached
    if _cached is not None:
        return _cached
    reason = _build_ggml() or _build_harness()
    if reason:
        _cached = (None, reason)
        return _cached
    try:
        lib = ctypes.CDLL(str(HARNESS_SO))
        _declare(lib)
    except OSError as e:
        _cached = (None, f"dlopen failed: {e}")
        return _cached
    _cached = (lib, "")
    return _cached
