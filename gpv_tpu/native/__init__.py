"""Native (C++) runtime components, loaded lazily through ctypes."""
from __future__ import annotations

import ctypes

import numpy as np

from .build import build_native, load_native


def solve_lsap_native(cost: np.ndarray) -> np.ndarray:
    """(M, Q) or (B, M, Q) float cost -> assigned column per row (int32)."""
    lib = load_native()
    cost = np.ascontiguousarray(cost, np.float32)
    if cost.ndim == 2:
        m, q = cost.shape
        out = np.empty((m,), np.int32)
        rc = lib.solve_lsap(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m, q,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    else:
        b, m, q = cost.shape
        out = np.empty((b, m), np.int32)
        rc = lib.solve_lsap_batch(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, m, q,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError(f"solve_lsap failed with code {rc}")
    return out


def resize_bilinear_native(img_u8: np.ndarray, out_h: int,
                           out_w: int) -> np.ndarray:
    """(H, W, C) uint8 -> (out_h, out_w, C) uint8 bilinear resize."""
    lib = load_native()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.resize_bilinear_u8(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
    return out


__all__ = ["build_native", "load_native", "solve_lsap_native",
           "resize_bilinear_native"]
