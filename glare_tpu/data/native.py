"""ctypes bindings for the C++ data-path core (native/glare_native.cpp).

Builds the shared library on first use (g++ -O3) and exposes fused
preprocessing primitives; every entry point has a numpy fallback so the
framework runs without a toolchain. Parity with the numpy path is tested in
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "glare_native.cpp")
_LIB = os.path.join(_REPO, "native", "libglare_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build():
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.u8_to_f32_log.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.c_float,
        ]
        lib.reflect_pad_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ] + [ctypes.c_int] * 7
        lib.preprocess_into_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ] + [ctypes.c_int] * 8 + [ctypes.c_float]
        lib.crop_augment_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ] + [ctypes.c_int] * 9
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def u8_to_f32(img_u8, apply_log=False, eps=1e-3):
    """uint8 array -> f32 /255 (+ log transform)."""
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    lib = load()
    if lib is None:
        x = img_u8.astype(np.float32) / 255.0
        return np.log(np.clip(x + eps, eps, None)) if apply_log else x
    out = np.empty(img_u8.shape, np.float32)
    lib.u8_to_f32_log(_u8p(img_u8), _f32p(out), img_u8.size, int(apply_log), eps)
    return out


def preprocess_padded(img_u8, top=0, bottom=0, left=0, right=0, apply_log=False,
                      eps=1e-3, out=None):
    """Fused uint8 HWC -> reflect-padded f32 HWC (optionally log-domain).

    `out` may be a preallocated [H+pad, W+pad, C] f32 slot (e.g. a batch row).
    """
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    lib = load()
    if lib is None:
        x = u8_to_f32(img_u8, apply_log, eps)
        res = np.pad(x, [(top, bottom), (left, right), (0, 0)], "reflect")
        if out is not None:
            out[...] = res
            return out
        return res
    if out is None:
        out = np.empty((h + top + bottom, w + left + right, c), np.float32)
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.float32
    lib.preprocess_into_batch(
        _u8p(img_u8), _f32p(out), h, w, c, top, bottom, left, right,
        int(apply_log), eps,
    )
    return out


def crop_augment(img_f32, top, left, hc, wc, hflip=False, vflip=False, rot90=0):
    """Fused crop + flip + rot90 (quarter turns in {0,1,3})."""
    img_f32 = np.ascontiguousarray(img_f32, np.float32)
    h, w, c = img_f32.shape
    lib = load()
    if lib is None:
        x = img_f32[top : top + hc, left : left + wc]
        if hflip:
            x = x[:, ::-1]
        if vflip:
            x = x[::-1]
        if rot90:
            x = np.rot90(x, rot90, axes=(0, 1))
        return np.ascontiguousarray(x)
    if rot90 in (1, 3):
        out = np.empty((wc, hc, c), np.float32)
    else:
        out = np.empty((hc, wc, c), np.float32)
    lib.crop_augment_f32(
        _f32p(img_f32), _f32p(out), w, c, top, left, hc, wc,
        int(hflip), int(vflip), int(rot90),
    )
    return out
