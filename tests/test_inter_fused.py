"""Fused inter kernel (refine + residual, one VMEM residency) vs the staged
composition — bit-exact end-to-end (interpret mode off-TPU)."""

import numpy as np
import pytest

from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode.loop import encode_inter_frame


@pytest.fixture
def frames():
    rng = np.random.default_rng(7)
    h, w = 128, 192
    base = rng.integers(0, 256, (h + 32, w + 32), dtype=np.uint8)
    cur = base[5 : 5 + h, 7 : 7 + w]
    ref = base[:h, :w]
    return cur, ref


def test_fused_inter_matches_stages(frames):
    cur, ref = frames
    out_s = encode_inter_frame(cur, ref, EncodeConfig(search_range=8))
    out_f = encode_inter_frame(
        cur, ref, EncodeConfig(search_range=8, inter_impl="fused")
    )
    assert np.array_equal(np.asarray(out_s["recon"]), np.asarray(out_f["recon"]))
    assert np.array_equal(np.asarray(out_s["mvs"]), np.asarray(out_f["mvs"]))
    assert int(out_s["nnz"]) == int(out_f["nnz"])


def test_fused_kernel_matches_parts(frames):
    """inter_ctu_fused == refine_quarter_pel_fused + residual_pipeline_ctu."""
    import jax.numpy as jnp

    from hevcasm_tpu.encode import ctu as ctu_mod, motion
    from hevcasm_tpu.kernels.interp_pallas import (
        inter_ctu_fused, refine_quarter_pel_fused)
    from hevcasm_tpu.kernels.residual_pallas import residual_pipeline_ctu

    cur, ref = frames
    cfg = EncodeConfig(search_range=8)
    rng = np.random.default_rng(3)
    src = ctu_mod.tile_frame(jnp.asarray(cur), 64)
    n = src.shape[0]
    rp = ctu_mod.pad_frame(jnp.asarray(ref), 8, 8 + 80, 8, 8 + 80)
    pos = motion.ctu_positions(2, 3, 64)
    mvs = jnp.asarray(rng.integers(-8, 9, (n, 2), dtype=np.int32))
    win = motion.extract_windows(rp, pos + mvs + 8, (72, 128))

    scale, shift, offset = cfg.quant_params(False)
    dscale, dshift = cfg.dequant_params()
    rec_f, frac_f, cost_f, nnz_f, _ = inter_ctu_fused(
        src, win, scale, shift, offset, dscale, dshift)

    pred, frac, cost = refine_quarter_pel_fused(src, win)
    rec, nnz = residual_pipeline_ctu(src, pred, scale, shift, offset, dscale, dshift)

    assert np.array_equal(np.asarray(rec_f), np.asarray(rec))
    assert np.array_equal(np.asarray(frac_f), np.asarray(frac))
    assert np.array_equal(np.asarray(cost_f), np.asarray(cost))
    assert np.array_equal(np.asarray(nnz_f), np.asarray(nnz))


def test_fused_batched_matches_fused(frames):
    """inter_ctu_fused_batched == inter_ctu_fused, incl. n % group != 0."""
    import jax.numpy as jnp

    from hevcasm_tpu.encode import ctu as ctu_mod, motion
    from hevcasm_tpu.kernels.interp_pallas import (
        inter_ctu_fused, inter_ctu_fused_batched)

    cur, ref = frames
    cfg = EncodeConfig(search_range=8)
    rng = np.random.default_rng(11)
    src = ctu_mod.tile_frame(jnp.asarray(cur), 64)
    n = src.shape[0]  # 6 CTUs
    rp = ctu_mod.pad_frame(jnp.asarray(ref), 8, 8 + 80, 8, 8 + 80)
    pos = motion.ctu_positions(2, 3, 64)
    mvs = jnp.asarray(rng.integers(-8, 9, (n, 2), dtype=np.int32))
    win = motion.extract_windows(rp, pos + mvs + 8, (72, 128))

    scale, shift, offset = cfg.quant_params(False)
    dscale, dshift = cfg.dequant_params()
    want = inter_ctu_fused(src, win, scale, shift, offset, dscale, dshift)
    for group in (4, 6, 2):  # n=6: remainder 2, exact, exact
        got = inter_ctu_fused_batched(
            src, win, scale, shift, offset, dscale, dshift, group=group)
        for w, g in zip(want, got):
            assert np.array_equal(np.asarray(w), np.asarray(g)), f"group={group}"


def test_fused_dma_matches_fused(frames):
    """inter_ctu_fused_dma (in-kernel slab DMA + de-skew) == the gather
    path, incl. edge CTUs (offsets 0 and max) and a plane width that is NOT
    a multiple of 128 (the wrapper must self-pad, ADVICE r2)."""
    import jax.numpy as jnp

    from hevcasm_tpu.encode import ctu as ctu_mod, motion
    from hevcasm_tpu.kernels.interp_pallas import (
        inter_ctu_fused, inter_ctu_fused_dma)

    cur, ref = frames
    cfg = EncodeConfig(search_range=8)
    rng = np.random.default_rng(13)
    h, w = cur.shape
    r = 8
    src = ctu_mod.tile_frame(jnp.asarray(cur), 64)
    n = src.shape[0]
    # The loop.py plane: (h + 2r + 7, w + 2r + 7) = (151, 215); 215 % 128 != 0.
    rp = ctu_mod.pad_frame(
        jnp.asarray(ref), r + motion.PAD_L, r + motion.PAD_R,
        r + motion.PAD_L, r + motion.PAD_R)
    pos = motion.ctu_positions(2, 3, 64)
    mvs = np.asarray(rng.integers(-r, r + 1, (n, 2), dtype=np.int32))
    mvs[0] = (-r, -r)   # corner CTU pushed to the plane origin (offset 0, 0)
    mvs[-1] = (r, r)    # corner CTU pushed to the max offset
    mvs = jnp.asarray(mvs)
    start = pos + mvs + r

    scale, shift, offset = cfg.quant_params(False)
    dscale, dshift = cfg.dequant_params()
    # Gather path for the expected values.
    rp_g = ctu_mod.pad_frame(rp, 0, 9, 0, 121)  # room for (72, 128) windows
    win = motion.extract_windows(rp_g, start, (72, 128))
    want = inter_ctu_fused(src, win, scale, shift, offset, dscale, dshift)
    for group in (4, 6):
        got = inter_ctu_fused_dma(
            src, rp, start, scale, shift, offset, dscale, dshift, group=group)
        for w_, g_ in zip(want, got):
            assert np.array_equal(np.asarray(w_), np.asarray(g_)), f"group={group}"


def test_fused_impls_match_stages_end_to_end(frames):
    """encode_inter_frame with every fused inter_impl == the staged path."""
    cur, ref = frames
    out_s = encode_inter_frame(cur, ref, EncodeConfig(search_range=8))
    for impl in ("fused_batched", "fused_dma"):
        out_f = encode_inter_frame(
            cur, ref,
            EncodeConfig(search_range=8, inter_impl=impl, fused_group=4))
        assert np.array_equal(
            np.asarray(out_s["recon"]), np.asarray(out_f["recon"])), impl
        assert np.array_equal(
            np.asarray(out_s["mvs"]), np.asarray(out_f["mvs"])), impl
        assert int(out_s["nnz"]) == int(out_f["nnz"]), impl


def test_mega_matches_stages(frames):
    """inter_impl='mega' (single-kernel search+refine+residual, one plane
    read per CTU) == the staged path, end to end."""
    cur, ref = frames
    out_s = encode_inter_frame(cur, ref, EncodeConfig(search_range=8))
    out_m = encode_inter_frame(
        cur, ref, EncodeConfig(search_range=8, inter_impl="mega"))
    assert np.array_equal(np.asarray(out_s["recon"]), np.asarray(out_m["recon"]))
    assert np.array_equal(np.asarray(out_s["mvs"]), np.asarray(out_m["mvs"]))
    assert np.array_equal(np.asarray(out_s["sad"]), np.asarray(out_m["sad"]))
    assert int(out_s["nnz"]) == int(out_m["nnz"])


def test_mega_extreme_motion(rng):
    """MVs clamped to the +-R corners (max slab de-skew) stay bit-exact."""
    import jax.numpy as jnp

    h, w, r = 128, 128, 16
    base = rng.integers(0, 256, (h + 2 * r, w + 2 * r), dtype=np.uint8)
    ref = base[:h, :w]
    cur = base[2 * r :, 2 * r :]  # content shifted by exactly +R in both axes
    out_s = encode_inter_frame(
        jnp.asarray(cur), jnp.asarray(ref), EncodeConfig(search_range=r))
    out_m = encode_inter_frame(
        jnp.asarray(cur), jnp.asarray(ref),
        EncodeConfig(search_range=r, inter_impl="mega"))
    assert np.array_equal(np.asarray(out_s["recon"]), np.asarray(out_m["recon"]))
    assert np.array_equal(np.asarray(out_s["mvs"]), np.asarray(out_m["mvs"]))
