"""SAD / SSD / SATD vs scalar oracles, sweeping the reference's partition
matrices (sad.c:231-240, ssd.c:157, hadamard.c:232)."""

import numpy as np
import pytest

from hevcasm_tpu import ops
import oracles

# The 23 partitions incl. AMP widths (sad.c:231-240).
PARTITIONS = [
    (64, 64), (64, 48), (64, 32), (64, 16),
    (48, 64),
    (32, 64), (32, 32), (32, 24), (32, 16), (32, 8),
    (24, 32),
    (16, 64), (16, 32), (16, 16), (16, 12), (16, 8), (16, 4),
    (12, 16),
    (8, 32), (8, 16), (8, 8), (8, 4),
    (4, 8),
]


def test_sad_partitions(rng):
    src = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    ref = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    for (w, h) in PARTITIONS:
        got = int(ops.sad(src[:h, :w], ref[1 : 1 + h, 1 : 1 + w]))
        want = oracles.sad(src[:h, :w], ref[1 : 1 + h, 1 : 1 + w])
        assert got == want, (w, h)


def test_sad_batched(rng):
    src = rng.integers(0, 256, (5, 16, 16), dtype=np.uint8)
    ref = rng.integers(0, 256, (5, 16, 16), dtype=np.uint8)
    got = np.asarray(ops.sad(src, ref))
    for i in range(5):
        assert got[i] == oracles.sad(src[i], ref[i])


def test_sad_multiref(rng):
    src = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    refs = rng.integers(0, 256, (4, 16, 16), dtype=np.uint8)
    got = np.asarray(ops.sad_multiref(src, refs))
    for k in range(4):
        assert got[k] == oracles.sad(src, refs[k])


def test_sad_grid(rng):
    src = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    win = rng.integers(0, 256, (8 + 4, 8 + 6), dtype=np.uint8)
    got = np.asarray(ops.sad_grid(src, win, 5, 7))
    assert got.shape == (5, 7)
    for dy in range(5):
        for dx in range(7):
            assert got[dy, dx] == oracles.sad(src, win[dy : dy + 8, dx : dx + 8])


def test_sad_grid_batched(rng):
    src = rng.integers(0, 256, (3, 8, 8), dtype=np.uint8)
    win = rng.integers(0, 256, (3, 12, 12), dtype=np.uint8)
    got = np.asarray(ops.sad_grid(src, win, 5, 5))
    for b in range(3):
        for dy in range(5):
            for dx in range(5):
                assert got[b, dy, dx] == oracles.sad(src[b], win[b, dy : dy + 8, dx : dx + 8])


def test_ssd_sizes(rng):
    a = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    b = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    for n in (4, 8, 16, 32, 64):
        assert int(ops.ssd(a[:n, :n], b[:n, :n])) == oracles.ssd(a[:n, :n], b[:n, :n])


def test_ssd_linear(rng):
    a = rng.integers(0, 256, (0x200,), dtype=np.uint8)
    b = rng.integers(0, 256, (0x200,), dtype=np.uint8)
    assert int(ops.ssd_linear(a, b)) == oracles.ssd(a[None], b[None])


@pytest.mark.parametrize("n", [2, 4, 8])
def test_satd(rng, n):
    # hadamard.c:214-235 tests with stride 2n; batch a few random blocks.
    for _ in range(8):
        a = rng.integers(0, 256, (n, n), dtype=np.uint8)
        b = rng.integers(0, 256, (n, n), dtype=np.uint8)
        assert int(ops.satd(a, b)) == oracles.satd(a, b)


def test_satd_batched(rng):
    a = rng.integers(0, 256, (6, 8, 8), dtype=np.uint8)
    b = rng.integers(0, 256, (6, 8, 8), dtype=np.uint8)
    got = np.asarray(ops.satd(a, b))
    for i in range(6):
        assert got[i] == oracles.satd(a[i], b[i])
