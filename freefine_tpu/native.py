"""ctypes bindings for the native C++ host ops (native/host_ops.cpp).

The library is built on demand with g++ (once per machine, cached next to
the source).  Every function has a numpy fallback so the package works
without a toolchain; `HAVE_NATIVE` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
import threading

import numpy as np

_SRC = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "native",
                "host_ops.cpp")
_LIB_PATH = osp.join(osp.dirname(_SRC), "libfreefine_host.so")
_lock = threading.Lock()
_lib = None
HAVE_NATIVE = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        # no toolchain / build failure -> numpy fallbacks take over
        return False


def _load():
    global _lib, HAVE_NATIVE
    with _lock:
        if _lib is not None:
            return _lib
        if not osp.exists(_LIB_PATH) and osp.exists(_SRC):
            _build()
        if osp.exists(_LIB_PATH):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                u8p = ctypes.POINTER(ctypes.c_uint8)
                f32p = ctypes.POINTER(ctypes.c_float)
                dp = ctypes.POINTER(ctypes.c_double)
                i64 = ctypes.c_int64
                lib.resize_nearest_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
                lib.resize_bilinear_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
                lib.dilate_u8.argtypes = [u8p, i64, i64, i64, u8p]
                lib.erode_u8.argtypes = [u8p, i64, i64, i64, u8p]
                lib.normalize_to_f32.argtypes = [u8p, i64, f32p]
                lib.masked_l1_u8.argtypes = [u8p, u8p, u8p, i64, i64, dp, dp]
                _lib = lib
                HAVE_NATIVE = True
            except OSError:
                _lib = False
        else:
            _lib = False
        return _lib


def _u8(a: np.ndarray):
    return np.ascontiguousarray(a, np.uint8)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 [H, W] or [H, W, C] nearest resize."""
    lib = _load()
    a = _u8(img)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w, c = a.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    if lib:
        lib.resize_nearest_u8(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
        )
    else:
        ys = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
        xs = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
        out = a[ys][:, xs]
    return out[:, :, 0] if squeeze else out


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 [H, W, C] bilinear resize (half-pixel centers)."""
    lib = _load()
    a = _u8(img)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w, c = a.shape
    if lib:
        out = np.empty((out_h, out_w, c), np.uint8)
        lib.resize_bilinear_u8(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
        )
    else:
        import jax
        import jax.numpy as jnp

        t = jax.image.resize(
            jnp.asarray(a, jnp.float32), (out_h, out_w, c), "linear"
        )
        out = np.clip(np.round(np.asarray(t)), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def dilate(mask: np.ndarray, factor: int) -> np.ndarray:
    """Binary square dilation, cv2 anchor; uint8 in, 0/255 out."""
    lib = _load()
    a = _u8((np.asarray(mask) > 0) * 255)
    h, w = a.shape
    if lib:
        out = np.empty_like(a)
        lib.dilate_u8(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, factor,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    import jax.numpy as jnp

    from freefine_tpu.masks import dilate as jdilate

    return (np.asarray(jdilate(jnp.asarray(a, jnp.float32) / 255.0, factor)) * 255
            ).astype(np.uint8)


def erode(mask: np.ndarray, factor: int) -> np.ndarray:
    lib = _load()
    a = _u8((np.asarray(mask) > 0) * 255)
    h, w = a.shape
    if lib:
        out = np.empty_like(a)
        lib.erode_u8(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, factor,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    import jax.numpy as jnp

    from freefine_tpu.masks import erode as jerode

    return (np.asarray(jerode(jnp.asarray(a, jnp.float32) / 255.0, factor)) * 255
            ).astype(np.uint8)


def normalize_to_f32(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1]."""
    lib = _load()
    a = _u8(img)
    if lib:
        out = np.empty(a.shape, np.float32)
        lib.normalize_to_f32(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), a.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    return a.astype(np.float32) / 127.5 - 1.0


def masked_l1(a: np.ndarray, b: np.ndarray, mask: np.ndarray) -> float:
    """sum |a-b|*m / sum m over 3-channel uint8 images (WRAP_E core)."""
    lib = _load()
    aa, bb = _u8(a), _u8(b)
    m = _u8(mask)
    if lib:
        s = ctypes.c_double()
        c = ctypes.c_double()
        lib.masked_l1_u8(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            aa.shape[0], aa.shape[1], ctypes.byref(s), ctypes.byref(c),
        )
        return s.value / max(c.value, 1e-12)
    mm = (m.astype(np.float64) / 255.0)[..., None]
    denom = mm.sum() * 3
    if denom == 0:
        return 0.0
    return float(
        np.abs(aa.astype(np.float64) / 255 * mm - bb.astype(np.float64) / 255 * mm
               ).sum() / denom
    )
