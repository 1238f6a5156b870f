"""Reference-sample substitution and smoothing (H.265 8.4.4.2.2-3) vs an
independent scalar transcription of the spec."""

import numpy as np
import pytest

from hevcasm_tpu.ops.pred_intra import (
    filter_flag, filter_references, strong_smoothing_condition,
    substitute_references)


def substitute_np(left, above, corner, lav, aav, cav):
    """Scalar 8.4.4.2.2: scan p[-1][2n-1]..p[-1][0], p[-1][-1],
    p[0][-1]..p[2n-1][-1]; unavailable samples take the previous available
    one; a leading run takes the first available; none -> 128."""
    s = list(left[::-1]) + [corner] + list(above)
    m = list(lav[::-1]) + [cav] + list(aav)
    if not any(m):
        out = [128] * len(s)
    else:
        out = list(s)
        first = m.index(True)
        for i in range(first):
            out[i] = s[first]
        for i in range(first + 1, len(s)):
            if not m[i]:
                out[i] = out[i - 1]
    n2 = len(left)
    return (np.array(out[:n2][::-1], np.uint8),
            np.array(out[n2 + 1:], np.uint8),
            np.uint8(out[n2]))


def filter_np(left, above, corner):
    """Scalar 8.4.4.2.3 [1 2 1] smoothing along the scan, endpoints kept."""
    s = list(map(int, left[::-1])) + [int(corner)] + list(map(int, above))
    out = list(s)
    for i in range(1, len(s) - 1):
        out[i] = (s[i - 1] + 2 * s[i] + s[i + 1] + 2) >> 2
    n2 = len(left)
    return (np.array(out[:n2][::-1], np.uint8),
            np.array(out[n2 + 1:], np.uint8),
            np.uint8(out[n2]))


@pytest.mark.parametrize("n", [8, 16, 32])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_substitution_matches_spec(n, seed):
    rng = np.random.default_rng(seed)
    m = 5
    left = rng.integers(0, 256, (m, 2 * n), dtype=np.uint8)
    above = rng.integers(0, 256, (m, 2 * n), dtype=np.uint8)
    corner = rng.integers(0, 256, (m,), dtype=np.uint8)
    lav = rng.random((m, 2 * n)) < 0.6
    aav = rng.random((m, 2 * n)) < 0.6
    cav = rng.random((m,)) < 0.6
    if seed == 0:
        lav[0] = aav[0] = False
        cav[0] = False  # nothing available -> all 128
    lo, ao, co = substitute_references(left, above, corner, lav, aav, cav)
    for i in range(m):
        le, ae, ce = substitute_np(left[i], above[i], corner[i],
                                   list(lav[i]), list(aav[i]), bool(cav[i]))
        assert np.array_equal(np.asarray(lo)[i], le)
        assert np.array_equal(np.asarray(ao)[i], ae)
        assert np.asarray(co)[i] == ce


@pytest.mark.parametrize("n", [8, 16, 32])
def test_filtering_matches_spec(n):
    rng = np.random.default_rng(3)
    m = 4
    left = rng.integers(0, 256, (m, 2 * n), dtype=np.uint8)
    above = rng.integers(0, 256, (m, 2 * n), dtype=np.uint8)
    corner = rng.integers(0, 256, (m,), dtype=np.uint8)
    lo, ao, co = filter_references(left, above, corner, n)
    for i in range(m):
        le, ae, ce = filter_np(left[i], above[i], corner[i])
        assert np.array_equal(np.asarray(lo)[i], le)
        assert np.array_equal(np.asarray(ao)[i], ae)
        assert np.asarray(co)[i] == ce


def test_strong_smoothing_bilinear():
    n = 32
    rng = np.random.default_rng(4)
    left = rng.integers(0, 256, (2, 64), dtype=np.uint8)
    above = rng.integers(0, 256, (2, 64), dtype=np.uint8)
    corner = rng.integers(0, 256, (2,), dtype=np.uint8)
    strong = np.array([True, False])
    lo, ao, co = filter_references(left, above, corner, n, strong=strong)
    # block 0: bilinear interpolation corner -> edge ends
    c, ae, le = int(corner[0]), int(above[0, 63]), int(left[0, 63])
    for k in range(63):
        assert np.asarray(ao)[0, k] == ((63 - k) * c + (k + 1) * ae + 32) >> 6
        assert np.asarray(lo)[0, k] == ((63 - k) * c + (k + 1) * le + 32) >> 6
    assert np.asarray(ao)[0, 63] == ae and np.asarray(lo)[0, 63] == le
    assert np.asarray(co)[0] == corner[0]
    # block 1: plain 1-2-1
    le1, ae1, ce1 = filter_np(left[1], above[1], corner[1])
    assert np.array_equal(np.asarray(lo)[1], le1)
    assert np.array_equal(np.asarray(ao)[1], ae1)


def test_strong_condition():
    # perfectly linear edges -> condition true; a jagged edge -> false
    lin = np.arange(64, dtype=np.uint8) * 2
    corner = np.array([0, 0], np.uint8)
    left = np.stack([lin, lin])
    above = np.stack([lin, np.roll(lin, 17)])
    cond = np.asarray(strong_smoothing_condition(left, above, corner))
    assert bool(cond[0]) and not bool(cond[1])


def test_filter_flag_table():
    # table 8-7 thresholds: 8 -> 7, 16 -> 1, 32 -> 0; DC and 4x4 never
    assert not filter_flag(1, 32) and not filter_flag(0, 4)
    assert filter_flag(0, 8) and filter_flag(2, 8) and filter_flag(18, 8)
    assert not filter_flag(25, 8)         # minDist 1 <= 7... wait |25-26|=1
    assert not filter_flag(26, 16) and filter_flag(24, 16)
    assert filter_flag(25, 32) and filter_flag(27, 32)
    assert not filter_flag(26, 32) and not filter_flag(10, 32)
