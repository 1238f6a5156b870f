"""The native C++ oracle (independent implementation, literal spec tables)
must agree bit-exactly with the jnp REF tier across every kernel family —
closing the oracle triangle: C++ <-> scalar numpy transcriptions <-> jnp."""

import numpy as np
import pytest

from hevcasm_tpu import ops

native = pytest.importorskip("hevcasm_tpu.native")

try:
    native.build()
except native.NativeUnavailable as e:  # pragma: no cover
    pytest.skip(f"native toolchain unavailable: {e}", allow_module_level=True)


def test_sad(rng):
    a = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    b = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    assert native.sad(a, b) == int(ops.sad(a, b))


def test_sad_grid(rng):
    src = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    win = rng.integers(0, 256, (12, 14), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.sad_grid(src, win, 5, 7), np.asarray(ops.sad_grid(src, win, 5, 7))
    )


def test_ssd(rng):
    a = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    b = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    assert native.ssd(a, b) == int(ops.ssd(a, b))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_satd(rng, n):
    a = rng.integers(0, 256, (n, n), dtype=np.uint8)
    b = rng.integers(0, 256, (n, n), dtype=np.uint8)
    assert native.satd(a, b) == int(ops.satd(a, b))


def test_quantize(rng):
    src = rng.integers(-32768, 32768, (16, 16)).astype(np.int16)
    got, cbf = native.quantize(src, 51, 20, 14)
    want, want_cbf = ops.quantize(src, 51, 20, 14)
    np.testing.assert_array_equal(got, np.asarray(want))
    assert cbf == bool(want_cbf)


def test_quantize_inverse(rng):
    src = (rng.integers(0, 256, (16, 16)) - 0x100).astype(np.int16)
    np.testing.assert_array_equal(
        native.quantize_inverse(src, 51, 14),
        np.asarray(ops.quantize_inverse(src, 51, 14)),
    )


def test_reconstruct(rng):
    pred = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    res = (rng.integers(0, 0x200, (16, 16)) - 0x100).astype(np.int16)
    np.testing.assert_array_equal(
        native.reconstruct(pred, res), np.asarray(ops.reconstruct(pred, res))
    )


@pytest.mark.parametrize("n,tr", [(4, 0), (4, 1), (8, 0), (16, 0), (32, 0)])
def test_transforms(rng, n, tr):
    res = rng.integers(-32768, 32768, (n, n)).astype(np.int16)
    np.testing.assert_array_equal(
        native.forward_transform(res, tr), np.asarray(ops.forward_transform(res, tr))
    )
    coeffs = rng.integers(0, 0x10000, (n, n)).astype(np.uint16).astype(np.int16)
    pred = rng.integers(0, 256, (n, n), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.inverse_transform_add(coeffs, pred, tr),
        np.asarray(ops.inverse_transform_add(coeffs, pred, tr)),
    )


@pytest.mark.parametrize("taps", [8, 4])
@pytest.mark.parametrize("fr", [(0, 0), (1, 2), (3, 0), (0, 3)])
def test_pred_uni(rng, taps, fr):
    xf, yf = fr
    if taps == 4:
        xf, yf = min(xf * 2, 7), min(yf * 2, 7)
    w, h = 16, 8
    win = rng.integers(0, 256, (h + taps - 1, w + taps - 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.pred_uni(win, w, h, xf, yf, taps),
        np.asarray(ops.pred_uni(win, xf, yf, taps)),
    )


@pytest.mark.parametrize("taps", [8, 4])
def test_pred_bi(rng, taps):
    w, h = 16, 8
    w0 = rng.integers(0, 256, (h + taps - 1, w + taps - 1), dtype=np.uint8)
    w1 = rng.integers(0, 256, (h + taps - 1, w + taps - 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.pred_bi(w0, w1, w, h, 1, 2, 3, 1, taps),
        np.asarray(ops.pred_bi(w0, w1, 1, 2, 3, 1, taps)),
    )


@pytest.mark.parametrize("edge", [False, True])
def test_pred_intra_dc(rng, edge):
    n = 8
    left = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    above = rng.integers(0, 256, (2 * n,), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.pred_intra_dc(left, above, n, edge),
        np.asarray(ops.pred_intra_dc(left, above, n, edge)),
    )
