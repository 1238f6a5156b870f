"""Transforms vs oracles: literal-matrix consistency, butterfly equivalence,
full forward/inverse bit-exactness, and the round-trip of BASELINE config 1."""

import numpy as np
import pytest

from hevcasm_tpu import ops
from hevcasm_tpu.ops import transform as tr
import oracles


def test_matrices_match_literals():
    """The DCT32-derived matrices must equal the normative literal tables."""
    np.testing.assert_array_equal(tr.dct_matrix(4), oracles.T4)
    np.testing.assert_array_equal(tr.dct_matrix(8), oracles.T8)
    np.testing.assert_array_equal(tr.dct_matrix(16), oracles.T16)
    np.testing.assert_array_equal(tr.dct_matrix(32)[1], oracles.T32_ROW1)
    np.testing.assert_array_equal(tr.DST4, oracles.DST4)
    # Structural: even rows of T32 are T16; odd rows are +-mirror-antisymmetric
    # (T32[k][31-j] == -T32[k][j] for odd k), which pins down every odd row's
    # second half against its first.
    t32 = tr.dct_matrix(32)
    np.testing.assert_array_equal(t32[::2, :16], oracles.T16)
    for k in range(1, 32, 2):
        np.testing.assert_array_equal(t32[k, ::-1], -t32[k])


def test_butterfly_equivalence(rng):
    """Matmul formulation == transcribed C butterflies (4x4)."""
    src = (rng.integers(0, 0x200, (4, 4)) - 0x100).astype(np.int16)
    for shift in (1, 8):
        np.testing.assert_array_equal(
            oracles.fwd_butterfly_4x4(src, shift),
            oracles._wrap16(
                (oracles.T4 @ src.T.astype(np.int64) + (1 << (shift - 1))) >> shift
            ),
        )
    coeffs = (rng.integers(0, 0x10000, (4, 4)) - 0x8000).astype(np.int16)
    for shift in (7, 12):
        np.testing.assert_array_equal(
            oracles.inv_butterfly_4x4(coeffs, shift),
            oracles.clip3(
                -32768, 32767,
                (coeffs.T.astype(np.int64) @ oracles.T4 + (1 << (shift - 1))) >> shift,
            ),
        )


SIZES = [(4, oracles.T4), (8, oracles.T8), (16, oracles.T16)]


@pytest.mark.parametrize("n,t", SIZES + [(32, None)])
def test_forward_transform(rng, n, t):
    if t is None:
        t = tr.dct_matrix(32).astype(np.int64)
    log2 = n.bit_length() - 1
    src = (rng.integers(0, 0x200, (n, n)) - 0x100).astype(np.int16)
    got = np.asarray(ops.forward_transform(src))
    want = oracles.forward_transform(src, t, log2 - 1, log2 + 6)
    np.testing.assert_array_equal(got, want)


def test_forward_dst(rng):
    src = (rng.integers(0, 0x200, (4, 4)) - 0x100).astype(np.int16)
    got = np.asarray(ops.forward_transform(src, tr_type=1))
    want = oracles.forward_transform(src, oracles.DST4, 1, 8)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,t", SIZES + [(32, None)])
def test_inverse_transform_add(rng, n, t):
    if t is None:
        t = tr.dct_matrix(32).astype(np.int64)
    # Extreme random coefficients as in residual_decode.c:574.
    coeffs = rng.integers(0, 0x10000, (n, n)).astype(np.uint16).astype(np.int16)
    pred = rng.integers(0, 256, (n, n), dtype=np.uint8)
    got = np.asarray(ops.inverse_transform_add(coeffs, pred))
    want = oracles.inverse_transform_add(coeffs, pred, t)
    np.testing.assert_array_equal(got, want)


def test_inverse_dst(rng):
    coeffs = rng.integers(0, 0x10000, (4, 4)).astype(np.uint16).astype(np.int16)
    pred = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    got = np.asarray(ops.inverse_transform_add(coeffs, pred, tr_type=1))
    want = oracles.inverse_transform_add(coeffs, pred, oracles.DST4)
    np.testing.assert_array_equal(got, want)


def test_transform_batched(rng):
    src = (rng.integers(0, 0x200, (5, 8, 8)) - 0x100).astype(np.int16)
    got = np.asarray(ops.forward_transform(src))
    for i in range(5):
        np.testing.assert_array_equal(
            got[i], oracles.forward_transform(src[i], oracles.T8, 2, 9)
        )


def test_roundtrip_ctu():
    """BASELINE config 1: 8x8 DCT + inverse-transform-add round-trip over one
    64x64 CTU; with lossless quantize settings the reconstruction must be
    close to the source (transform rounding only), and bit-exact vs oracle."""
    rng = np.random.default_rng(7)
    ctu = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    pred = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    blocks = ctu.reshape(8, 8, 8, 8).transpose(0, 2, 1, 3).reshape(64, 8, 8)
    pblocks = pred.reshape(8, 8, 8, 8).transpose(0, 2, 1, 3).reshape(64, 8, 8)
    res = blocks.astype(np.int16) - pblocks.astype(np.int16)
    coeffs = np.asarray(ops.forward_transform(res))
    rec = np.asarray(ops.inverse_transform_add(coeffs, pblocks))
    for i in range(64):
        want_c = oracles.forward_transform(res[i], oracles.T8, 2, 9)
        np.testing.assert_array_equal(coeffs[i], want_c)
        want_r = oracles.inverse_transform_add(want_c, pblocks[i], oracles.T8)
        np.testing.assert_array_equal(rec[i], want_r)
    # forward shift normalisation keeps the round-trip within +-1 of source
    assert np.max(np.abs(rec.astype(int) - blocks.astype(int))) <= 1
