"""Inter prediction vs the transcribed generic C filter, across all
copy/H/V/HV cases, both tap counts, and the reference's partition sweep
(pred_inter.c:436-458).  The jnp path is one unified separable pass; these
tests pin its bit-exact equivalence to the reference's four-way dispatch."""

import numpy as np
import pytest

from hevcasm_tpu import ops
from hevcasm_tpu.ops import pred_inter as pi
import oracles

PARTITIONS = [(8, 4), (8, 8), (4, 8), (16, 12), (12, 16), (16, 16), (32, 24), (64, 16)]


def _window(rng, w, h, taps):
    return rng.integers(0, 256, (h + taps - 1, w + taps - 1), dtype=np.uint8)


@pytest.mark.parametrize("taps", [8, 4])
@pytest.mark.parametrize("xfrac,yfrac", [(0, 0), (1, 0), (0, 1), (2, 3), (3, 2), (1, 1)])
def test_pred_uni_cases(rng, taps, xfrac, yfrac):
    if taps == 4:
        xfrac, yfrac = min(xfrac * 2, 7), min(yfrac * 2, 7)
    for (w, h) in [(8, 4), (16, 8), (4, 8)]:
        win = _window(rng, w, h, taps)
        got = np.asarray(ops.pred_uni(win, xfrac, yfrac, taps))
        want = oracles.pred_uni(win, w, h, xfrac, yfrac, taps)
        np.testing.assert_array_equal(got, want, err_msg=f"{taps}tap {w}x{h} f=({xfrac},{yfrac})")


@pytest.mark.parametrize("taps", [8, 4])
def test_pred_uni_partition_sweep(rng, taps):
    # Scaled by taps/8 as the reference does (pred_inter.c:451-452).
    for (pw, ph) in PARTITIONS:
        w, h = pw * taps // 8, ph * taps // 8
        for (xf, yf) in [(0, 0), (2, 0), (0, 2), (1, 3)]:
            win = _window(rng, w, h, taps)
            got = np.asarray(ops.pred_uni(win, xf, yf, taps))
            want = oracles.pred_uni(win, w, h, xf, yf, taps)
            np.testing.assert_array_equal(got, want, err_msg=f"{w}x{h} f=({xf},{yf})")


def test_pred_uni_batched_traced_frac(rng):
    """Per-block fractional MVs as traced arrays (the encode-loop calling
    convention): each block may use a different kernel row."""
    w = h = 8
    wins = rng.integers(0, 256, (6, h + 7, w + 7), dtype=np.uint8)
    xf = np.array([0, 1, 2, 3, 0, 2], dtype=np.int32)
    yf = np.array([2, 0, 1, 3, 0, 2], dtype=np.int32)
    got = np.asarray(ops.pred_uni(wins, xf, yf, 8))
    for i in range(6):
        want = oracles.pred_uni(wins[i], w, h, int(xf[i]), int(yf[i]), 8)
        np.testing.assert_array_equal(got[i], want)


@pytest.mark.parametrize("taps", [8, 4])
@pytest.mark.parametrize(
    "fr", [(0, 0, 0, 0), (1, 2, 3, 1), (0, 3, 2, 0), (2, 2, 2, 2)]
)
def test_pred_bi(rng, taps, fr):
    fx0, fy0, fx1, fy1 = fr
    if taps == 4:
        fx0, fy0, fx1, fy1 = (min(f * 2, 7) for f in fr)
    w, h = 16, 8
    win0 = _window(rng, w, h, taps)
    win1 = _window(rng, w, h, taps)
    got = np.asarray(ops.pred_bi(win0, win1, fx0, fy0, fx1, fy1, taps))
    want = oracles.pred_bi(win0, win1, w, h, fx0, fy0, fx1, fy1, taps)
    np.testing.assert_array_equal(got, want)


def test_kernels_match_reference_tables():
    np.testing.assert_array_equal(pi.KERNEL8, np.array(oracles.LUMA_KERNEL))
    np.testing.assert_array_equal(pi.KERNEL4, np.array(oracles.CHROMA_KERNEL))
