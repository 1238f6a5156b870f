"""Per-stage timing of the 1080p inter encode loop on the real chip.

Throwaway diagnostic (not part of the package): jit each stage separately,
chain it x32 on device inside one dispatch, report ms/frame per stage.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode import ctu as ctu_mod
from hevcasm_tpu.encode import motion
from hevcasm_tpu.encode.loop import _residual_pipeline

cfg = EncodeConfig(search_range=32, qp=32)
h, w = 1088, 1920
rng = np.random.default_rng(0)
base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
cur = jnp.asarray(base[2 : 2 + h, 3 : 3 + w])
ref = jnp.asarray(base[:h, :w])

gr, gc = ctu_mod.grid_shape(h, w, cfg.ctu)
r = cfg.search_range
src_ctus = ctu_mod.tile_frame(cur, cfg.ctu)
ref_padded = ctu_mod.pad_frame(ref, r + motion.PAD_L, r + motion.PAD_R, r + motion.PAD_L, r + motion.PAD_R)
pos = motion.ctu_positions(gr, gc, cfg.ctu)
grid_fn = motion.grid_metric_fn(cfg.me_metric)

ITERS = 16


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return out


# Stage 1: window extraction alone
def win_fn(ref_padded):
    return motion.extract_aligned_windows(ref_padded, (motion.PAD_L, motion.PAD_L), (gr, gc), 64, 128)

win = timed("extract_aligned_windows", win_fn, ref_padded)

# Stage 2: ssd grid
def grid(src_ctus, win):
    return grid_fn(src_ctus, win, 65, 65)

timed("ssd_grid (65x65)", grid, src_ctus, win)

# Stage 3: full search total (windows + grid + argmin)
def fs(src_ctus, ref_padded):
    return motion.full_search(src_ctus, ref_padded, pos, r, grid_fn=grid_fn, grid=(gr, gc))

mv_int, _ = timed("full_search total", fs, src_ctus, ref_padded)

# Stage 4: quarter-pel refinement
def refine(src_ctus, ref_padded, mv_int):
    return motion.refine_quarter_pel(src_ctus, ref_padded, pos, mv_int, r)

pred, _, _ = timed("refine_quarter_pel", refine, src_ctus, ref_padded, mv_int)

# Stage 5: residual pipeline
def resid(src_ctus, pred):
    return _residual_pipeline(src_ctus, pred, cfg, intra=False)

timed("residual_pipeline", resid, src_ctus, pred)

# Whole frame for reference
from hevcasm_tpu.encode.loop import encode_inter_frame

def whole(cur, ref):
    return encode_inter_frame(cur, ref, cfg)

timed("encode_inter_frame (whole)", whole, cur, ref)

# --- Alternates ---
from hevcasm_tpu.kernels.residual_pallas import residual_pipeline_ctu
from hevcasm_tpu.kernels.interp_pallas import refine_quarter_pel_fused
from hevcasm_tpu.kernels import xla_opt

scale, shift, offset = cfg.quant_params(False)
dscale, dshift = cfg.dequant_params()

def resid_fused(src_ctus, pred):
    return residual_pipeline_ctu(src_ctus, pred, scale, shift, offset, dscale, dshift)

timed("residual_pallas fused", resid_fused, src_ctus, pred)

def resid_xlaopt(src_ctus, pred):
    res = src_ctus.astype(jnp.int16) - pred.astype(jnp.int16)
    tus = ctu_mod.split_blocks(res, cfg.tu)
    ptus = ctu_mod.split_blocks(pred, cfg.tu)
    coeffs = xla_opt.forward_transform(tus, 0)
    from hevcasm_tpu.ops.quantize import quantize, quantize_inverse
    levels, cbf = quantize(coeffs, scale, shift, offset)
    rcoeffs = quantize_inverse(levels, dscale, dshift)
    rec_tus = xla_opt.inverse_transform_add(rcoeffs, ptus, 0)
    return ctu_mod.merge_blocks(rec_tus, 64), jnp.sum(levels.astype(jnp.int32) != 0)

timed("residual xla_opt tier", resid_xlaopt, src_ctus, pred)

start = pos + mv_int + r
winq = motion.extract_windows(ref_padded, start, 64 + motion.TAPS - 1)

def refine_fused(src_ctus, winq):
    return refine_quarter_pel_fused(src_ctus, winq)

timed("refine_pallas fused", refine_fused, src_ctus, winq)

from hevcasm_tpu.kernels.interp_xla import refine_quarter_pel_mxu
from hevcasm_tpu.kernels.xla_opt import residual_pipeline_frame

def refine_mxu(src_ctus, winq):
    return refine_quarter_pel_mxu(src_ctus, winq)

timed("refine_mxu", refine_mxu, src_ctus, winq)

def resid_mxu(src_ctus, pred):
    return residual_pipeline_frame(src_ctus, pred, scale, shift, offset, dscale, dshift)

timed("residual_mxu", resid_mxu, src_ctus, pred)
