"""ctypes binding for the native C++ oracle library (native/hevcref.cpp).

The native library is the implementation-independent golden model — the role
of the reference's C tier.  It is built on demand with g++ (no pybind11 in
this image; plain C ABI + ctypes).  All entry points take/return numpy
arrays and scalars; they are NOT jax-traceable (host-only oracles for tests
and the self-test harness).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "hevcref.cpp"
_LIB = Path(__file__).resolve().parent.parent / "native" / "libhevcref.so"

_lib = None


class NativeUnavailable(RuntimeError):
    pass


def build(force: bool = False) -> Path:
    """Compile the native library if needed; returns the .so path."""
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", b"") or b""
        raise NativeUnavailable(f"g++ build failed: {detail.decode()[:500]}") from e
    return _LIB


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build()))
        _lib.hevcref_sad.restype = ctypes.c_int32
        _lib.hevcref_ssd.restype = ctypes.c_int64
        _lib.hevcref_satd.restype = ctypes.c_int32
        _lib.hevcref_quantize.restype = ctypes.c_int32
    return _lib


def _u8(a):
    a = np.ascontiguousarray(a, dtype=np.uint8)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i16(a):
    a = np.ascontiguousarray(a, dtype=np.int16)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def sad(src, ref):
    src, ps = _u8(src)
    ref, pr = _u8(ref)
    h, w = src.shape
    return int(lib().hevcref_sad(ps, src.shape[1], pr, ref.shape[1], w, h))


def sad_grid(src, win, num_dy, num_dx):
    src, ps = _u8(src)
    win, pw = _u8(win)
    h, w = src.shape
    out = np.zeros((num_dy, num_dx), np.int32)
    lib().hevcref_sad_grid(
        ps, pw, w, h, num_dy, num_dx,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def ssd(a, b):
    a, pa = _u8(a)
    b, pb = _u8(b)
    h, w = a.shape
    return int(lib().hevcref_ssd(pa, a.shape[1], pb, b.shape[1], w, h))


def ssd_grid(src, win, num_dy, num_dx):
    src, ps = _u8(src)
    win, pw = _u8(win)
    h, w = src.shape
    out = np.zeros((num_dy, num_dx), np.int32)
    lib().hevcref_ssd_grid(
        ps, pw, w, h, num_dy, num_dx,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def satd(a, b):
    a, pa = _u8(a)
    b, pb = _u8(b)
    n = a.shape[0]
    return int(lib().hevcref_satd(pa, a.shape[1], pb, b.shape[1], n))


def quantize(src, scale, shift, offset):
    src, ps = _i16(src)
    dst = np.zeros_like(src)
    cbf = lib().hevcref_quantize(
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), ps,
        scale, shift, offset, src.size,
    )
    return dst, bool(cbf)


def quantize_inverse(src, scale, shift):
    src, ps = _i16(src)
    dst = np.zeros_like(src)
    lib().hevcref_quantize_inverse(
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), ps, scale, shift, src.size
    )
    return dst


def reconstruct(pred, res):
    pred, pp = _u8(pred)
    res, pr = _i16(res)
    n = pred.shape[0]
    rec = np.zeros_like(pred)
    lib().hevcref_reconstruct(
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, pp, n, pr, n
    )
    return rec


def forward_transform(res, tr_type=0):
    res, pr = _i16(res)
    n = res.shape[0]
    out = np.zeros_like(res)
    lib().hevcref_forward_transform(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), pr, n, tr_type
    )
    return out


def inverse_transform_add(coeffs, pred, tr_type=0):
    coeffs, pc = _i16(coeffs)
    pred, pp = _u8(pred)
    n = pred.shape[0]
    rec = np.zeros_like(pred)
    lib().hevcref_inverse_transform_add(
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), pc, pp, n, tr_type
    )
    return rec


def pred_uni(win, w, h, xfrac, yfrac, taps=8):
    win, pw = _u8(win)
    dst = np.zeros((h, w), np.uint8)
    lib().hevcref_pred_uni(
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), pw, w, h, xfrac, yfrac, taps
    )
    return dst


def pred_bi(win0, win1, w, h, fx0, fy0, fx1, fy1, taps=8):
    win0, p0 = _u8(win0)
    win1, p1 = _u8(win1)
    dst = np.zeros((h, w), np.uint8)
    lib().hevcref_pred_bi(
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), p0, p1, w, h,
        fx0, fy0, fx1, fy1, taps,
    )
    return dst


def pred_intra_dc(left, above, n, filter_edge=False):
    left, pl = _u8(left)
    above, pa = _u8(above)
    dst = np.zeros((n, n), np.uint8)
    lib().hevcref_pred_intra_dc(
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), pl, pa, n, int(filter_edge)
    )
    return dst
