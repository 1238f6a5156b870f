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
    rec_f, frac_f, cost_f, nnz_f = inter_ctu_fused(
        src, win, scale, shift, offset, dscale, dshift)

    pred, frac, cost = refine_quarter_pel_fused(src, win)
    rec, nnz = residual_pipeline_ctu(src, pred, scale, shift, offset, dscale, dshift)

    assert np.array_equal(np.asarray(rec_f), np.asarray(rec))
    assert np.array_equal(np.asarray(frac_f), np.asarray(frac))
    assert np.array_equal(np.asarray(cost_f), np.asarray(cost))
    assert np.array_equal(np.asarray(nnz_f), np.asarray(nnz))
