"""ctypes binding to the native (C++) runtime library.

Fast paths: mmap'd zero-copy GGUF tensor access, bulk f16/bf16 widening, and
PCM16 WAV output.  Built on demand from native/zvnative.cpp (g++, no external
deps); every entry point has a pure-Python fallback, so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libzvnative.so"))

_lock = threading.Lock()
_lib = None
_build_failed = False


def _try_build() -> bool:
    src = os.path.join(_NATIVE_DIR, "zvnative.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _try_build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.zv_gguf_open.restype = ctypes.c_void_p
        lib.zv_gguf_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.zv_gguf_close.argtypes = [ctypes.c_void_p]
        lib.zv_gguf_n_tensors.restype = ctypes.c_int64
        lib.zv_gguf_n_tensors.argtypes = [ctypes.c_void_p]
        lib.zv_gguf_tensor_name.restype = ctypes.c_char_p
        lib.zv_gguf_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.zv_gguf_tensor_info.restype = ctypes.c_int
        lib.zv_gguf_tensor_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.zv_gguf_tensor_data.restype = ctypes.c_void_p
        lib.zv_gguf_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zv_f16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        lib.zv_bf16_to_f32.argtypes = lib.zv_f16_to_f32.argtypes
        lib.zv_wav_write_pcm16.restype = ctypes.c_int
        lib.zv_wav_write_pcm16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


class NativeGGUF:
    """Native mmap'd GGUF tensor accessor (metadata still read in Python)."""

    _GGML_TO_NP = {0: np.float32, 1: np.float16, 24: np.int8, 25: np.int16,
                   26: np.int32, 27: np.int64, 28: np.float64}

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        err = ctypes.create_string_buffer(256)
        self._h = lib.zv_gguf_open(path.encode(), err, 256)
        if not self._h:
            raise ValueError(f"{path}: {err.value.decode()}")

    def tensor_names(self):
        n = self._lib.zv_gguf_n_tensors(self._h)
        return [self._lib.zv_gguf_tensor_name(self._h, i).decode()
                for i in range(n)]

    def get(self, name: str, as_float32: bool = False) -> np.ndarray:
        lib = self._lib
        gt = ctypes.c_int32()
        nd = ctypes.c_int32()
        ne = (ctypes.c_int64 * 4)()
        nb = ctypes.c_int64()
        if lib.zv_gguf_tensor_info(self._h, name.encode(), ctypes.byref(gt),
                                   ctypes.byref(nd), ne, ctypes.byref(nb)) != 0:
            raise KeyError(name)
        ptr = lib.zv_gguf_tensor_data(self._h, name.encode())
        if not ptr:
            raise KeyError(name)
        shape = tuple(reversed([ne[d] for d in range(nd.value)]))  # numpy order
        nelem = int(np.prod(shape)) if shape else 1

        if gt.value == 30:  # BF16 -> f32 via native widening
            out = np.empty(nelem, dtype=np.float32)
            lib.zv_bf16_to_f32(ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint16)),
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                               nelem)
            return out.reshape(shape)
        if gt.value == 1 and as_float32:  # F16 -> f32 fast path
            out = np.empty(nelem, dtype=np.float32)
            lib.zv_f16_to_f32(ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint16)),
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              nelem)
            return out.reshape(shape)
        if gt.value not in self._GGML_TO_NP:
            raise NotImplementedError(f"{name}: ggml type {gt.value}")
        dt = np.dtype(self._GGML_TO_NP[gt.value])
        buf = (ctypes.c_uint8 * int(nb.value)).from_address(ptr)
        arr = np.frombuffer(buf, dtype=dt).reshape(shape)
        if as_float32 and arr.dtype != np.float32:
            arr = arr.astype(np.float32)
        return arr

    def load_all(self, as_float32: bool = True) -> Dict[str, np.ndarray]:
        # copy=True detaches from the mmap so close() is safe afterwards
        return {n: np.array(self.get(n, as_float32=as_float32), copy=True)
                for n in self.tensor_names()}

    def close(self):
        if self._h:
            self._lib.zv_gguf_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_wav_native(path: str, wav: np.ndarray, sampling_rate: int) -> bool:
    """Native PCM16 WAV write; returns False if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    wav = np.ascontiguousarray(np.asarray(wav, dtype=np.float32).reshape(-1))
    rc = lib.zv_wav_write_pcm16(
        path.encode(), wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav.size, sampling_rate)
    if rc != 0:
        raise OSError(f"native WAV write failed ({rc}): {path}")
    return True
