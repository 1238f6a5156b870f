"""YUV / Y4M round-trip through the native reader and the numpy fallback."""

import numpy as np
import pytest

from hevcasm_tpu import io as yio


def _frames(rng, t, h, w):
    return [
        yio.YuvArrays(
            rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        )
        for _ in range(t)
    ]


def test_y4m_roundtrip(rng, tmp_path):
    frames = _frames(rng, 3, 64, 96)
    p = tmp_path / "clip.y4m"
    yio.write_y4m(p, frames, 96, 64, fps=(30, 1))
    w, h, fn, fd, hdr = yio.read_y4m(p)
    assert (w, h, fn, fd) == (96, 64, 30, 1)
    got = list(yio.iter_frames(p))
    assert len(got) == 3
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
        np.testing.assert_array_equal(a.cr, b.cr)


def test_raw_yuv_roundtrip(rng, tmp_path):
    frames = _frames(rng, 2, 32, 48)
    p = tmp_path / "clip.yuv"
    with open(p, "wb") as f:
        for fr in frames:
            f.write(fr.y.tobytes())
            f.write(fr.cb.tobytes())
            f.write(fr.cr.tobytes())
    got = list(yio.iter_frames(p, width=48, height=32))
    assert len(got) == 2
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)


def test_fallback_matches_native(rng, tmp_path):
    frames = _frames(rng, 2, 32, 32)
    p = tmp_path / "c.y4m"
    yio.write_y4m(p, frames, 32, 32)
    native_frames = list(yio.iter_frames(p))
    # force fallback
    saved = yio._lib
    yio._lib = False
    try:
        fb_frames = list(yio.iter_frames(p))
    finally:
        yio._lib = saved
    for a, b in zip(native_frames, fb_frames):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
        np.testing.assert_array_equal(a.cr, b.cr)
