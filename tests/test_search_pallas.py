"""Pallas full-search SSD grid vs the REF/JIT tiers (interpret mode off-TPU).

Mirrors the reference's oracle discipline (hevcasm_test.c:96-104): same
random inputs, bit-exact integer comparison across every strategy variant.
"""

import numpy as np
import pytest

from hevcasm_tpu.kernels import search_pallas, xla_opt


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize("b,r", [(16, 8), (16, 4), (32, 12), (64, 32)])
def test_ssd_grid_matches_jit(rng, b, r):
    n, num, size = 3, 2 * r + 1, b + 2 * r
    src = rng.integers(0, 256, (n, b, b), dtype=np.uint8)
    win = rng.integers(0, 256, (n, size, size), dtype=np.uint8)
    ref = np.asarray(xla_opt.ssd_grid(src, win, num, num))
    got = np.asarray(search_pallas.ssd_grid(src, win, num, num))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("stack", ["serial", "double", "packed"])
@pytest.mark.parametrize("band", ["rolls", "tree"])
@pytest.mark.parametrize("mm", ["int8", "bf16"])
def test_ssd_grid_variants(rng, stack, band, mm):
    n, b, r = 2, 16, 8
    num, size = 2 * r + 1, b + 2 * r
    src = rng.integers(0, 256, (n, b, b), dtype=np.uint8)
    win = rng.integers(0, 256, (n, size, size), dtype=np.uint8)
    ref = np.asarray(xla_opt.ssd_grid(src, win, num, num))
    got = np.asarray(
        search_pallas.ssd_grid(src, win, num, num, stack=stack, band=band, mm=mm)
    )
    assert np.array_equal(got, ref)


def test_ssd_grid_2d_contract(rng):
    b, r = 16, 4
    num, size = 2 * r + 1, b + 2 * r
    src = rng.integers(0, 256, (b, b), dtype=np.uint8)
    win = rng.integers(0, 256, (size, size), dtype=np.uint8)
    ref = np.asarray(xla_opt.ssd_grid(src[None], win[None], num, num))[0]
    got = np.asarray(search_pallas.ssd_grid(src, win, num, num))
    assert got.shape == (num, num)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("chunks", [1, 2, 4, 8, 16])
def test_ssd_grid_chunked(rng, chunks):
    """Chunked-K formulation == unchunked == XLA oracle, incl. asymmetric
    grids and both 64 and 32 block sizes."""
    for b, ndy, ndx in [(64, 65, 65), (64, 9, 17), (32, 33, 33)]:
        n = 2
        wh, ww = b + ndy - 1, b + ndx - 1
        src = rng.integers(0, 256, (n, b, b), dtype=np.uint8)
        win = rng.integers(0, 256, (n, wh, ww), dtype=np.uint8)
        ref = np.asarray(xla_opt.ssd_grid(src, win, ndy, ndx))
        got = np.asarray(
            search_pallas.ssd_grid(src, win, ndy, ndx, chunks=chunks)
        )
        assert np.array_equal(got, ref), (b, ndy, ndx, chunks)
