"""Pallas kernels in interpreter mode (tiny shapes) vs the REF tier."""

import numpy as np
import pytest

from hevcasm_tpu import ops
from hevcasm_tpu.kernels import sad_pallas


def test_sad_matches(rng):
    a = rng.integers(0, 256, (3, 8, 8), dtype=np.uint8)
    b = rng.integers(0, 256, (3, 8, 8), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(sad_pallas.sad(a, b)), np.asarray(ops.sad(a, b)))


def test_sad_multiref_matches(rng):
    a = rng.integers(0, 256, (2, 8, 8), dtype=np.uint8)
    r = rng.integers(0, 256, (2, 4, 8, 8), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(sad_pallas.sad_multiref(a, r)), np.asarray(ops.sad_multiref(a, r))
    )


def test_sad_grid_matches(rng):
    src = rng.integers(0, 256, (2, 8, 8), dtype=np.uint8)
    win = rng.integers(0, 256, (2, 12, 12), dtype=np.uint8)
    got = np.asarray(sad_pallas.sad_grid(src, win, 5, 5))
    want = np.asarray(ops.sad_grid(src, win, 5, 5))
    np.testing.assert_array_equal(got, want)
