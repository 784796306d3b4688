"""Build + load the native C++ runtime components (ctypes, no pybind11).

Compiles gpv_tpu/native/*.cc into a cached shared library on first use.
"""
from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_SOURCES = ["lap.cc", "imageproc.cc"]


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        h.update((_DIR / s).read_bytes())
    return h.hexdigest()[:16]


def build_native(force: bool = False) -> Path:
    build_dir = _DIR / "_build"  # not a package: keeps pkgutil walks clean
    build_dir.mkdir(exist_ok=True)
    so_path = build_dir / f"gpv_native_{_source_hash()}.so"
    if so_path.exists() and not force:
        return so_path
    # compile to a per-pid temp then atomically rename: concurrent worker
    # processes racing the first build must never CDLL a half-written .so
    import os
    tmp_path = build_dir / f".gpv_native_{_source_hash()}.{os.getpid()}.so"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", str(tmp_path)] + [str(_DIR / s) for s in _SOURCES] + \
          ["-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp_path, so_path)
    return so_path


_lib = None


def load_native() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_native()))
        lib.solve_lsap.restype = ctypes.c_int
        lib.solve_lsap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.solve_lsap_batch.restype = ctypes.c_int
        lib.solve_lsap_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.resize_bilinear_u8.restype = None
        lib.resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
        lib.color_jitter_f32.restype = None
        lib.color_jitter_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        _lib = lib
    return _lib
