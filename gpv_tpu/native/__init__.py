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


# color-jitter op codes shared with imageproc.cc
JITTER_BRIGHTNESS, JITTER_CONTRAST = 0, 1
JITTER_SATURATION, JITTER_HUE, JITTER_GRAYSCALE = 2, 3, 4


def color_jitter_native(img_f32: np.ndarray, ops, factors) -> np.ndarray:
    """Apply jitter ops (codes above) with per-op factors, in place on a
    C-contiguous (H, W, 3) float32 image; returns the same array."""
    lib = load_native()
    assert img_f32.dtype == np.float32 and img_f32.flags.c_contiguous
    h, w, c = img_f32.shape
    assert c == 3
    ops_a = np.asarray(ops, np.int32)
    fac_a = np.asarray(factors, np.float32)
    lib.color_jitter_f32(
        img_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        ops_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fac_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(ops_a))
    return img_f32


__all__ = ["build_native", "load_native", "solve_lsap_native",
           "resize_bilinear_native", "color_jitter_native",
           "JITTER_BRIGHTNESS", "JITTER_CONTRAST", "JITTER_SATURATION",
           "JITTER_HUE", "JITTER_GRAYSCALE"]
