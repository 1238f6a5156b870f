"""ctypes binding for the GENUINE kupix/hevcasm C reference, compiled
unmodified from the upstream tree (default /root/reference) into
native/libhevcasm_cref.so by the Makefile `cref` target.

This is the strongest correctness oracle available: every hevcasm_tpu tier
can be differential-tested against the actual upstream C_REF semantics (the
literal BASELINE.json bit-exactness bar), not against our own transcriptions
(native/hevcref.cpp plays that secondary, implementation-independent role).

Host-only (numpy in / numpy out); unavailable when the reference tree is not
mounted — tests skip in that case.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
_LIB = _ROOT / "native" / "libhevcasm_cref.so"
_REFERENCE = Path(os.environ.get("HEVCASM_REFERENCE", "/root/reference"))

_lib = None


class CrefUnavailable(RuntimeError):
    pass


def available() -> bool:
    return _LIB.exists() or (_REFERENCE / "src" / "lib" / "sad.c").exists()


def build() -> Path:
    if _LIB.exists():
        return _LIB
    if not (_REFERENCE / "src" / "lib" / "sad.c").exists():
        raise CrefUnavailable(f"reference tree not found at {_REFERENCE}")
    try:
        subprocess.run(
            ["make", "-C", str(_ROOT), "cref", f"REFERENCE={_REFERENCE}"],
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", b"") or b""
        raise CrefUnavailable(f"cref build failed: {detail.decode()[:500]}") from e
    return _LIB


_U8P = ctypes.POINTER(ctypes.c_uint8)
_I16P = ctypes.POINTER(ctypes.c_int16)
_I32P = ctypes.POINTER(ctypes.c_int32)
_PD = ctypes.c_ssize_t  # ptrdiff_t
_I = ctypes.c_int

_SIGNATURES = {
    "cref_sad": (_I, [_U8P, _PD, _U8P, _PD, _I, _I]),
    "cref_sad_multiref": (None, [_U8P, _PD, _U8P, _U8P, _U8P, _U8P, _PD, _I32P, _I, _I]),
    "cref_ssd": (_I, [_U8P, _PD, _U8P, _PD, _I]),
    "cref_ssd_linear": (_I, [_U8P, _U8P, _I]),
    "cref_satd": (_I, [_U8P, _PD, _U8P, _PD, _I]),
    "cref_quantize": (_I, [_I16P, _I16P, _I, _I, _I, _I]),
    "cref_quantize_inverse": (None, [_I16P, _I16P, _I, _I, _I]),
    "cref_reconstruct": (None, [_U8P, _PD, _U8P, _PD, _I16P, _I]),
    "cref_transform": (None, [_I16P, _I16P, _PD, _I, _I]),
    "cref_inverse_transform_add": (None, [_U8P, _PD, _U8P, _PD, _I16P, _I, _I]),
    "cref_pred_uni": (None, [_U8P, _PD, _U8P, _PD, _I, _I, _I, _I, _I]),
    "cref_pred_bi": (None, [_U8P, _PD, _U8P, _U8P, _PD, _I, _I, _I, _I, _I, _I, _I]),
    "cref_pred_intra_dc": (None, [_U8P, _U8P, _I, _I]),
}


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build()))
        for name, (res, args) in _SIGNATURES.items():
            f = getattr(_lib, name)
            f.restype = res
            f.argtypes = args
    return _lib


def _u8(a):
    a = np.ascontiguousarray(a, dtype=np.uint8)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i16(a):
    a = np.ascontiguousarray(a, dtype=np.int16)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def _pi16(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def _pu8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def sad(src, ref):
    src, ps = _u8(src)
    ref, pr = _u8(ref)
    h, w = src.shape
    return int(lib().cref_sad(ps, src.shape[1], pr, ref.shape[1], w, h))


def sad_multiref(src, refs):
    """refs: (4, h, w).  Returns the 4 SADs."""
    src, ps = _u8(src)
    refs = np.ascontiguousarray(refs, dtype=np.uint8)
    h, w = src.shape
    out = np.zeros(4, np.int32)
    lib().cref_sad_multiref(
        ps, w, _pu8(refs[0]), _pu8(refs[1]), _pu8(refs[2]), _pu8(refs[3]),
        w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h,
    )
    return out


def ssd(a, b):
    a, pa = _u8(a)
    b, pb = _u8(b)
    n = a.shape[0]
    return int(lib().cref_ssd(pa, a.shape[1], pb, b.shape[1], n.bit_length() - 1))


def ssd_linear(a, b):
    a, pa = _u8(a)
    b, pb = _u8(b)
    return int(lib().cref_ssd_linear(pa, pb, a.size))


def satd(a, b):
    a, pa = _u8(a)
    b, pb = _u8(b)
    n = a.shape[0]
    return int(lib().cref_satd(pa, a.shape[1], pb, b.shape[1], n.bit_length() - 1))


def quantize(src, scale, shift, offset):
    src, ps = _i16(src)
    dst = np.zeros_like(src)
    cbf = lib().cref_quantize(_pi16(dst), ps, scale, shift, offset, src.size)
    return dst, bool(cbf)


def quantize_inverse(src, scale, shift):
    src, ps = _i16(src)
    dst = np.zeros_like(src)
    lib().cref_quantize_inverse(_pi16(dst), ps, scale, shift, src.size)
    return dst


def reconstruct(pred, res):
    pred, pp = _u8(pred)
    res, pr = _i16(res)
    n = pred.shape[0]
    rec = np.zeros_like(pred)
    lib().cref_reconstruct(_pu8(rec), n, pp, n, pr, n.bit_length() - 1)
    return rec


def forward_transform(res, tr_type=0):
    res, pr = _i16(res)
    n = res.shape[0]
    out = np.zeros_like(res)
    lib().cref_transform(_pi16(out), pr, n, tr_type, n.bit_length() - 1)
    return out


def inverse_transform_add(coeffs, pred, tr_type=0):
    coeffs, pc = _i16(coeffs)
    pred, pp = _u8(pred)
    n = pred.shape[0]
    rec = np.zeros_like(pred)
    lib().cref_inverse_transform_add(_pu8(rec), n, pp, n, pc, tr_type,
                                     n.bit_length() - 1)
    return rec


def pred_uni(win, w, h, xfrac, yfrac, taps=8):
    """win: extended window (h+taps-1, w+taps-1); origin at (pad, pad) with
    pad = taps//2 - 1, the convention of ops.pred_inter."""
    win, pw = _u8(win)
    pad = taps // 2 - 1
    stride = win.shape[1]
    ref0 = win[pad:, pad:]  # ref pointer at the block origin
    dst = np.zeros((h, w), np.uint8)
    lib().cref_pred_uni(_pu8(dst), w, _pu8(ref0), stride, w, h, xfrac, yfrac, taps)
    return dst


def pred_bi(win0, win1, w, h, fx0, fy0, fx1, fy1, taps=8):
    win0 = np.ascontiguousarray(win0, dtype=np.uint8)
    win1 = np.ascontiguousarray(win1, dtype=np.uint8)
    pad = taps // 2 - 1
    stride = win0.shape[1]
    dst = np.zeros((h, w), np.uint8)
    lib().cref_pred_bi(_pu8(dst), w, _pu8(win0[pad:, pad:]), _pu8(win1[pad:, pad:]),
                       stride, w, h, fx0, fy0, fx1, fy1, taps)
    return dst


def pred_intra_dc(left, above, n, filter_edge=False):
    """left/above: (2n,) neighbour runs.  Builds the f265-layout neighbour
    buffer read by pred_intra.c:56-62 (buf[63-dy]=left[dy], buf[64+dx]=above[dx])."""
    left = np.ascontiguousarray(left, dtype=np.uint8)
    above = np.ascontiguousarray(above, dtype=np.uint8)
    buf = np.zeros(192, np.uint8)
    for dy in range(2 * n):
        buf[63 - dy] = left[dy]
    buf[64 : 64 + 2 * n] = above[: 2 * n]
    dst = np.zeros((n, n), np.uint8)
    lib().cref_pred_intra_dc(_pu8(dst), _pu8(buf), n.bit_length() - 1,
                             int(filter_edge))
    return dst
