"""Pallas full-search SSD grid vs the REF/JIT tiers (interpret mode off-TPU).

Mirrors the reference's oracle discipline (hevcasm_test.c:96-104): same
random inputs, bit-exact integer comparison across every strategy variant.
"""

import numpy as np
import jax.numpy as jnp
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


def test_base_grids_ctu_matches_per_block(rng):
    """The per-CTU base-grids kernel (shared window + shared energy box +
    masked sub-stacks) == independent per-sub-block ssd_grid calls, for
    every base size.  Guards the Mosaic scalar-extract regression (an
    in-kernel (k, k)[i, j] read returned the wrong element on TPU; srcsq
    now arrives as a per-sub-block (1, 1) input)."""
    import jax.numpy as jnp

    from hevcasm_tpu.encode import ctu as ctu_mod
    from hevcasm_tpu.kernels.search_pallas import base_grids_ctu

    n, r = 2, 32
    src = jnp.asarray(rng.integers(0, 256, (n, 64, 64), dtype=np.uint8))
    win = jnp.asarray(rng.integers(0, 256, (n, 128, 128), dtype=np.uint8))
    for base in (8, 16, 32):
        k = 64 // base
        got = np.asarray(base_grids_ctu(src, win, base))
        srcb = ctu_mod.split_blocks(src, base)
        wsub = base + 2 * r
        slabs = [win[:, base * i : base * i + wsub, base * j : base * j + wsub]
                 for i in range(k) for j in range(k)]
        winb = jnp.stack(slabs, axis=1).reshape(n * k * k, wsub, wsub)
        want = np.asarray(
            xla_opt.ssd_grid(srcb, winb, 65, 65)).reshape(n, k, k, 65, 65)
        assert np.array_equal(got, want), f"base={base}"


def test_search_variants_match_full_search(rng):
    """The kept experimental search variants — in-kernel argmin
    (search_mv), in-kernel slab DMA (search_mv_dma), and the layout-in-XLA
    prep path (ssd_grid(prep='xla')) — all bit-match the default grid path
    (they are measured non-defaults: docs/DESIGN.md section 7)."""
    import jax.numpy as jnp

    from hevcasm_tpu.encode import ctu as ctu_mod, motion
    from hevcasm_tpu.kernels.search_pallas import (
        search_mv, search_mv_dma, ssd_grid)

    h, w, r, b = 192, 256, 32, 64
    gr, gc = h // b, w // b
    cur = rng.integers(0, 256, (h, w), dtype=np.uint8)
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    src = ctu_mod.tile_frame(jnp.asarray(cur), b)
    pos = motion.ctu_positions(gr, gc, b)
    rp = ctu_mod.pad_frame(jnp.asarray(ref), r + 3, r + 4, r + 3, r + 4)
    mv0, best0 = motion.full_search(src, rp, pos, r, grid_fn=xla_opt.ssd_grid,
                                    grid=(gr, gc))
    win = motion.extract_aligned_windows(rp, (3, 3), (gr, gc), b, b + 2 * r)

    mv1, best1 = search_mv(src, win, 2 * r + 1, group=3)
    assert np.array_equal(np.asarray(mv0), np.asarray(mv1))
    assert np.array_equal(np.asarray(best0), np.asarray(best1))

    mv2, best2 = search_mv_dma(src, rp, pos, r)
    assert np.array_equal(np.asarray(mv0), np.asarray(mv2))
    assert np.array_equal(np.asarray(best0), np.asarray(best2))

    want = np.asarray(xla_opt.ssd_grid(src, win, 65, 65))
    got = np.asarray(ssd_grid(src, win, 65, 65, prep="xla"))
    assert np.array_equal(want, got)


def test_ssd_grid_plane_matches_gathered(rng):
    # Slab kernel (windows read from the plane in 64-row blocks) vs
    # ssd_grid on gathered windows — bit-exact.
    from hevcasm_tpu.kernels.search_pallas import ssd_grid_plane

    gr, gc = 2, 4
    plane = rng.integers(0, 256, (gr * 64 + 64, gc * 64 + 64), dtype=np.uint8)
    src = rng.integers(0, 256, (gr * gc, 64, 64), dtype=np.uint8)
    win = np.stack([plane[64 * r : 64 * r + 128, 64 * c : 64 * c + 128]
                    for r in range(gr) for c in range(gc)])
    ref = np.asarray(search_pallas.ssd_grid(src, win, 65, 65))
    got = np.asarray(ssd_grid_plane(src, jnp.asarray(plane), (gr, gc), 65))
    np.testing.assert_array_equal(got, ref)


def test_ssd_grid_plane_multi_matches_per_plane(rng):
    # k-reference slab search (stack built once, scored per plane) vs
    # per-plane slab calls — bit-exact.
    from hevcasm_tpu.kernels.search_pallas import (
        ssd_grid_plane, ssd_grid_plane_multi)

    gr, gc, k = 2, 2, 3
    planes = rng.integers(0, 256, (k, gr * 64 + 64, gc * 64 + 64),
                          dtype=np.uint8)
    src = rng.integers(0, 256, (gr * gc, 64, 64), dtype=np.uint8)
    got = np.asarray(ssd_grid_plane_multi(src, jnp.asarray(planes), (gr, gc), 65))
    for p in range(k):
        want = np.asarray(ssd_grid_plane(src, jnp.asarray(planes[p]), (gr, gc), 65))
        np.testing.assert_array_equal(got[:, p], want, err_msg=f"plane {p}")


def test_full_search_slab_matches_full_search(rng):
    # The loop-level slab path == motion.full_search (same argmin
    # semantics) for the covered geometry.
    from hevcasm_tpu.encode import ctu as ctu_mod, motion

    gr, gc, r = 2, 4, 32
    h, w = gr * 64, gc * 64
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cur = rng.integers(0, 256, (h, w), dtype=np.uint8)
    src = ctu_mod.tile_frame(jnp.asarray(cur), 64)
    pad = ctu_mod.pad_frame(jnp.asarray(ref), r + motion.PAD_L, r + motion.PAD_R,
                            r + motion.PAD_L, r + motion.PAD_R)
    pos = motion.ctu_positions(gr, gc, 64)
    gf = motion.grid_metric_fn("ssd")
    mv_a, best_a = motion.full_search(src, pad, pos, r, grid_fn=gf, grid=(gr, gc))
    mv_b, best_b = motion.full_search_slab(src, pad, r, (gr, gc))
    np.testing.assert_array_equal(np.asarray(mv_b), np.asarray(mv_a))
    np.testing.assert_array_equal(np.asarray(best_b), np.asarray(best_a))
