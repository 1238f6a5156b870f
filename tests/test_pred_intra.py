"""Intra prediction: DC vs the transcribed reference (bit-exact), plus
self-consistency properties of the planar/angular modes the reference never
wired up (pred_intra.c:116-139)."""

import numpy as np
import pytest

from hevcasm_tpu import ops
import oracles


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("filter_edge", [False, True])
def test_dc(rng, n, filter_edge):
    left = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    above = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    got = np.asarray(ops.pred_intra_dc(left, above, n, filter_edge))
    want = oracles.pred_intra_dc(left, above, n, filter_edge)
    np.testing.assert_array_equal(got, want)


def test_dc_batched(rng):
    n = 8
    left = rng.integers(0, 256, (5, 2 * n), dtype=np.uint8)
    above = rng.integers(0, 256, (5, 2 * n), dtype=np.uint8)
    got = np.asarray(ops.pred_intra_dc(left, above, n, True))
    for i in range(5):
        np.testing.assert_array_equal(got[i], oracles.pred_intra_dc(left[i], above[i], n, True))


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_planar_flat(rng, n):
    """Planar over constant neighbours must reproduce the constant."""
    left = np.full((2 * n,), 117, dtype=np.uint8)
    above = np.full((2 * n,), 117, dtype=np.uint8)
    got = np.asarray(ops.pred_intra_planar(left, above, n))
    np.testing.assert_array_equal(got, np.full((n, n), 117))


def test_planar_gradient():
    """Planar must interpolate linearly between opposing edges."""
    n = 4
    left = np.zeros((2 * n,), dtype=np.uint8)
    above = np.zeros((2 * n,), dtype=np.uint8)
    above[n] = 64  # top-right sample drives the horizontal ramp
    got = np.asarray(ops.pred_intra_planar(left, above, n))
    # dst[y, x] = ((x+1)*64 + n) >> (log2+1) per spec with all else zero
    want = (((np.arange(n) + 1) * 64 + n) >> 3)[None, :].repeat(n, axis=0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 8])
def test_angular_pure_vertical_horizontal(rng, n):
    left = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    above = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    corner = np.uint8(rng.integers(0, 256))
    v = np.asarray(ops.pred_intra_angular(left, above, corner, n, 26))
    np.testing.assert_array_equal(v, np.broadcast_to(above[:n], (n, n)))
    h = np.asarray(ops.pred_intra_angular(left, above, corner, n, 10))
    np.testing.assert_array_equal(h, np.broadcast_to(left[:n][:, None], (n, n)))


@pytest.mark.parametrize("n", [4, 8])
def test_angular_diagonal_mode2(rng, n):
    """Mode 2 (angle +32, horizontal family): dst[y, x] = left[x + y + 1]."""
    left = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    above = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    corner = np.uint8(0)
    got = np.asarray(ops.pred_intra_angular(left, above, corner, n, 2))
    want = np.empty((n, n), dtype=np.uint8)
    for y in range(n):
        for x in range(n):
            want[y, x] = left[x + y + 1]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 8])
def test_angular_mode34(rng, n):
    """Mode 34 (angle +32, vertical family): dst[y, x] = above[x + y + 1]."""
    left = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    above = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    got = np.asarray(ops.pred_intra_angular(left, above, np.uint8(0), n, 34))
    want = np.empty((n, n), dtype=np.uint8)
    for y in range(n):
        for x in range(n):
            want[y, x] = above[x + y + 1]
    np.testing.assert_array_equal(got, want)


def _ref_at(main, side, corner, inv):
    def ref_at(i):  # ref[i], i may be negative (invAngle projection)
        if i >= 0:
            return int(corner) if i == 0 else int(main[i - 1])
        y0 = -1 + ((i * inv + 128) >> 8)
        return int(corner) if y0 < 0 else int(side[y0])

    return ref_at


@pytest.mark.parametrize("mode,angle,inv", [(23, -9, -910), (19, -26, -315), (30, 13, None)])
def test_angular_vertical_family_oracle(rng, mode, angle, inv):
    """Vertical-family modes (18..34) vs a scalar 8.4.4.2.6 transcription:
    predSamples[x][y] = ((32-iFact)*ref[x+iIdx+1] + iFact*ref[x+iIdx+2]+16)>>5
    with iIdx/iFact from (y+1)*angle, main edge = above."""
    n = 8
    left = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    above = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    corner = np.uint8(rng.integers(0, 256))
    got = np.asarray(ops.pred_intra_angular(left, above, corner, n, mode))

    ref_at = _ref_at(above, left, corner, inv)
    want = np.empty((n, n), dtype=np.uint8)
    for y in range(n):
        i_idx = ((y + 1) * angle) >> 5
        i_fact = ((y + 1) * angle) & 31
        for x in range(n):
            r0 = ref_at(x + i_idx + 1)
            r1 = ref_at(x + i_idx + 2)
            want[y, x] = ((32 - i_fact) * r0 + i_fact * r1 + 16) >> 5
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode,angle,inv", [(13, -9, -910), (17, -26, -315), (6, 13, None)])
def test_angular_horizontal_family_oracle(rng, mode, angle, inv):
    """Horizontal-family modes (2..17): same with x/y swapped and the main
    edge = left (8.4.4.2.6 'predModeIntra less than 18' clause)."""
    n = 8
    left = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    above = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    corner = np.uint8(rng.integers(0, 256))
    got = np.asarray(ops.pred_intra_angular(left, above, corner, n, mode))

    ref_at = _ref_at(left, above, corner, inv)
    want = np.empty((n, n), dtype=np.uint8)
    for x in range(n):
        i_idx = ((x + 1) * angle) >> 5
        i_fact = ((x + 1) * angle) & 31
        for y in range(n):
            r0 = ref_at(y + i_idx + 1)
            r1 = ref_at(y + i_idx + 2)
            want[y, x] = ((32 - i_fact) * r0 + i_fact * r1 + 16) >> 5
    np.testing.assert_array_equal(got, want)


def test_all_modes_shape(rng):
    n = 8
    left = rng.integers(0, 256, (3, 2 * n), dtype=np.uint8)
    above = rng.integers(0, 256, (3, 2 * n), dtype=np.uint8)
    corner = rng.integers(0, 256, (3,), dtype=np.uint8)
    out = np.asarray(ops.pred_intra_all_modes(left, above, corner, n))
    assert out.shape == (3, 35, n, n)


def test_intra_matrix_all_modes_bit_exact(rng):
    # The constant-matmul formulation (kernels/intra_matrix) must equal the
    # per-mode jnp path for every mode at n == 32 (no edge filter).
    import jax.numpy as jnp
    from hevcasm_tpu.kernels.intra_matrix import (
        intra_mode_decision_t, pred_intra_all_modes_mm)
    from hevcasm_tpu.ops.pred_intra import (
        filter_flag, filter_references, pred_intra)

    n, m = 32, 5
    left = jnp.asarray(rng.integers(0, 256, (m, 2 * n), dtype=np.uint8))
    above = jnp.asarray(rng.integers(0, 256, (m, 2 * n), dtype=np.uint8))
    corner = jnp.asarray(rng.integers(0, 256, (m,), dtype=np.uint8))
    blocks = jnp.asarray(rng.integers(0, 256, (m, n, n), dtype=np.uint8))
    lf, af, cf = filter_references(left, above, corner, n)
    allm = np.asarray(pred_intra_all_modes_mm(left, above, corner, lf, af, cf, n))
    for mode in range(35):
        refs = (lf, af, cf) if filter_flag(mode, n) else (left, above, corner)
        want = np.asarray(pred_intra(mode, *refs, n, filter_edge=False))
        np.testing.assert_array_equal(allm[:, mode], want, err_msg=f"mode {mode}")

    # The Hadamard-domain decision's winning prediction is the exact
    # pred_intra output of the chosen mode.
    pred, best, _ = intra_mode_decision_t(blocks, left, above, corner, lf, af, cf, n)
    pred, best = np.asarray(pred), np.asarray(best)
    for i in range(m):
        mode = int(best[i])
        refs = (lf, af, cf) if filter_flag(mode, n) else (left, above, corner)
        want = np.asarray(pred_intra(mode, refs[0][i:i+1], refs[1][i:i+1],
                                     refs[2][i:i+1], n, filter_edge=False))[0]
        np.testing.assert_array_equal(pred[i], want, err_msg=f"slot {i}")
