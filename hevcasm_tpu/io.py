"""Frame I/O: raw planar 4:2:0 YUV and Y4M readers/writers.

Uses the native library (native/yuv_io.cpp, built on demand) for positioned
reads; falls back to numpy if the toolchain is unavailable.  Frames are
returned as encode.video.YuvFrame numpy triples ready for device_put.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, NamedTuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "yuv_io.cpp"
_LIB = Path(__file__).resolve().parent.parent / "native" / "libyuvio.so"

_lib = None


class YuvArrays(NamedTuple):
    y: np.ndarray
    cb: np.ndarray
    cr: np.ndarray


def _native():
    global _lib
    if _lib is None:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                    check=True, capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                _lib = False
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.yuv_y4m_parse.restype = ctypes.c_int64
        lib.yuv_read_frame.restype = ctypes.c_int64
        _lib = lib
    return _lib or None


def _frame_bytes(w: int, h: int) -> int:
    return w * h * 3 // 2


def read_y4m(path: str | Path) -> tuple[int, int, int, int, int]:
    """Parse a Y4M header; returns (width, height, fps_num, fps_den, hdr_len)."""
    path = str(path)
    lib = _native()
    if lib is not None:
        w = ctypes.c_int(); h = ctypes.c_int()
        fn = ctypes.c_int(); fd = ctypes.c_int()
        hdr = lib.yuv_y4m_parse(path.encode(), ctypes.byref(w), ctypes.byref(h),
                                ctypes.byref(fn), ctypes.byref(fd))
        if hdr < 0:
            raise ValueError(f"not a Y4M file: {path}")
        return w.value, h.value, fn.value, fd.value, int(hdr)
    with open(path, "rb") as f:
        line = f.readline().decode("ascii", "replace")
        hdr = f.tell()
    if not line.startswith("YUV4MPEG2"):
        raise ValueError(f"not a Y4M file: {path}")
    w = h = 0
    fn, fd = 25, 1
    for tok in line.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fn, fd = (int(v) for v in tok[1:].split(":"))
    return w, h, fn, fd, hdr


def iter_frames(path: str | Path, width: int | None = None, height: int | None = None) -> Iterator[YuvArrays]:
    """Yield 4:2:0 frames from a .y4m (geometry from header) or raw .yuv
    (geometry required) file."""
    path = Path(path)
    if path.suffix == ".y4m":
        w, h, _, _, off = read_y4m(path)
        marker = 6  # "FRAME\n"
    else:
        assert width and height, "raw .yuv needs explicit geometry"
        w, h, off, marker = width, height, 0, 0

    lib = _native()
    size = path.stat().st_size
    step = marker + _frame_bytes(w, h)
    while off + step <= size:
        y = np.empty((h, w), np.uint8)
        cb = np.empty((h // 2, w // 2), np.uint8)
        cr = np.empty((h // 2, w // 2), np.uint8)
        if lib is not None:
            n = lib.yuv_read_frame(
                str(path).encode(), off, w, h, marker,
                y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if n < 0:
                return
        else:
            with open(path, "rb") as f:
                f.seek(off + marker)
                y[:] = np.fromfile(f, np.uint8, w * h).reshape(h, w)
                cb[:] = np.fromfile(f, np.uint8, w * h // 4).reshape(h // 2, w // 2)
                cr[:] = np.fromfile(f, np.uint8, w * h // 4).reshape(h // 2, w // 2)
            n = step
        yield YuvArrays(y, cb, cr)
        off += int(n)


def write_y4m(path: str | Path, frames, width: int, height: int, fps=(25, 1)) -> None:
    """Write frames (iterable of YuvArrays) as a Y4M file."""
    path = Path(path)
    header = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n"
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        for fr in frames:
            f.write(b"FRAME\n")
            f.write(np.ascontiguousarray(fr.y, np.uint8).tobytes())
            f.write(np.ascontiguousarray(fr.cb, np.uint8).tobytes())
            f.write(np.ascontiguousarray(fr.cr, np.uint8).tobytes())
