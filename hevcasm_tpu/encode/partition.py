"""Variable block structure: per-CTU PU-size decision (64/32/16) and
per-CTU TU-size selection (4/8/16/32).

The reference keys every kernel table on block geometry (sad.h:52-67,
pred_inter.h:58-67, residual_decode.h:56-74) and leaves the split decisions
to client encoders.  The TPU-native formulation keeps every shape static and
turns the decisions into masked selections between frame-batched
alternatives:

* Motion/PU: the integer-SSD candidate grid is ADDITIVE over sub-blocks —
  grid(CTU) == sum of the grids of its 16x16 sub-blocks at the same
  displacement.  So ONE search at 16x16 granularity yields the exact grids
  of every PU level by summation: g16 (4, 4, grid), g32 = 2x2 box sums,
  g64 = total.  Each PU then takes its own argmin (independent MVs), and
  the per-CTU level choice minimises  sum(best SSD) + lambda_mv * num_PUs
  (a rate proxy for the extra motion vectors).

* TU: the fused residual pipeline runs per candidate TU size over the whole
  frame (block-diagonal kron(I, T_tu) matmuls, kernels/xla_opt.py), and the
  per-CTU choice minimises  SSD(src, recon) + lambda_tu * nnz  (distortion
  plus a coded-coefficient rate proxy).  This exercises the 4/8/16/32
  transforms end-to-end.

Both decisions are bit-reproducible given the config; tests verify grid
additivity against independent per-PU searches and the end-to-end paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ctu as ctu_mod
from . import motion

__all__ = ["multi_level_search", "select_pu_pred", "select_tu_recon", "mv_lambda"]


def mv_lambda(qp: int) -> int:
    """Motion-cost weight for the PU-level decision: the HM-style
    lambda = 0.85 * 2^((qp-12)/3), scaled to integer-SSD units."""
    return max(1, int(round(0.85 * 2.0 ** ((qp - 12) / 3.0))))


def _grid_levels(g16: jnp.ndarray):
    """g16 (n, 4, 4, dy, dx) int32 -> (g32 (n, 2, 2, dy, dx), g64 (n, dy, dx))."""
    n, _, _, ndy, ndx = g16.shape
    g32 = (
        g16.reshape(n, 2, 2, 2, 2, ndy, ndx).sum(axis=(2, 4))
    )
    g64 = g32.sum(axis=(1, 2))
    return g32, g64


def _argmin_grid(g: jnp.ndarray, r: int):
    """(..., ndy, ndx) -> (mv (..., 2) int32 in [-r, r], best (...,) int32)."""
    ndy, ndx = g.shape[-2], g.shape[-1]
    flat = g.reshape(*g.shape[:-2], ndy * ndx)
    idx = jnp.argmin(flat, axis=-1).astype(jnp.int32)
    best = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    mv = jnp.stack([idx // ndx - r, idx % ndx - r], axis=-1)
    return mv, best


def multi_level_search(src_ctus: jnp.ndarray, windows: jnp.ndarray, r: int,
                       grid_fn):
    """Full search at 16x16 granularity + exact grid aggregation to 32/64.

    src_ctus (n, 64, 64); windows (n, 64+2r, 64+2r) search windows (the
    CTU-level window; each 16x16 sub-block's window is a slice of it).
    Returns dict with per-level (mv, best):
      mv16 (n, 4, 4, 2), mv32 (n, 2, 2, 2), mv64 (n, 2) and matching bests.
    """
    n = src_ctus.shape[0]
    num = 2 * r + 1
    # 16x16 sub-blocks, row-major (i, j).
    src16 = ctu_mod.split_blocks(src_ctus, 16)              # (n*16, 16, 16)
    # Sub-block (i, j)'s +-r window is the CTU window shifted by its offset.
    wsub = 16 + 2 * r
    slabs = [windows[:, 16 * i : 16 * i + wsub, 16 * j : 16 * j + wsub]
             for i in range(4) for j in range(4)]
    win16 = jnp.stack(slabs, axis=1).reshape(n * 16, wsub, wsub)
    g16 = grid_fn(src16, win16, num, num).reshape(n, 4, 4, num, num)
    g32, g64 = _grid_levels(g16)
    mv16, b16 = _argmin_grid(g16, r)
    mv32, b32 = _argmin_grid(g32, r)
    mv64, b64 = _argmin_grid(g64, r)
    return {
        "mv16": mv16, "best16": b16,
        "mv32": mv32, "best32": b32,
        "mv64": mv64, "best64": b64,
    }


def pu_level_costs(search, lam: int):
    """Per-CTU costs of the three PU layouts: sum of best SSDs plus
    lambda * (number of PUs) as the motion-rate proxy.  Returns
    (cost64, cost32, cost16) each (n,) int32."""
    c64 = search["best64"] + lam * 1
    c32 = search["best32"].sum(axis=(1, 2)) + lam * 4
    c16 = search["best16"].sum(axis=(1, 2)) + lam * 16
    return c64, c32, c16


def _refine_subblocks(src_ctus, ref_padded, pos, mvs, r, sub: int):
    """Quarter-pel refine every (sub x sub) PU of each CTU with its own MV.

    mvs (n, k, k, 2) with k = 64 // sub.  Returns pred (n, 64, 64)."""
    from ..kernels.interp_pallas import refine_quarter_pel_fused

    n = src_ctus.shape[0]
    k = 64 // sub
    srcs = ctu_mod.split_blocks(src_ctus, sub)              # (n*k*k, sub, sub)
    off = jnp.stack(
        jnp.meshgrid(jnp.arange(k) * sub, jnp.arange(k) * sub, indexing="ij"),
        axis=-1,
    ).reshape(1, k * k, 2)
    pos_sub = (pos[:, None, :] + off).reshape(n * k * k, 2)
    start = pos_sub + mvs.reshape(n * k * k, 2) + r
    win = motion.extract_windows(ref_padded, start, (sub + 8, 128))
    pred, frac, _ = refine_quarter_pel_fused(srcs, win)
    pred = ctu_mod.merge_blocks(pred.reshape(n * k * k, sub, sub), 64)
    mv_qpel = mvs.reshape(n * k * k, 2) * 4 + jnp.stack(
        [frac // 4, frac % 4], axis=-1
    )
    return pred, mv_qpel.reshape(n, k, k, 2)


def select_pu_pred(src_ctus, ref_padded, pos, search, r, lam: int):
    """Refine all three PU layouts and select per CTU by cost.

    Returns (pred (n, 64, 64) uint8, level (n,) int32 0/1/2 for 64/32/16,
    mv_qpel dict per level)."""
    c64, c32, c16 = pu_level_costs(search, lam)
    costs = jnp.stack([c64, c32, c16], axis=-1)
    level = jnp.argmin(costs, axis=-1).astype(jnp.int32)

    # Extend the padded plane so the aligned (sub+8, 128) slab gathers never
    # clamp at the bottom/right edge (need 1 extra row; 121-sub extra cols).
    ref_ext = ctu_mod.pad_frame(ref_padded, 0, 1, 0, 112)
    p64, q64 = _refine_subblocks(src_ctus, ref_ext, pos,
                                 search["mv64"][:, None, None, :], r, 64)
    p32, q32 = _refine_subblocks(src_ctus, ref_ext, pos, search["mv32"], r, 32)
    p16, q16 = _refine_subblocks(src_ctus, ref_ext, pos, search["mv16"], r, 16)

    sel = level[:, None, None]
    pred = jnp.where(sel == 0, p64, jnp.where(sel == 1, p32, p16))
    return pred, level, {"q64": q64, "q32": q32, "q16": q16}


def select_tu_recon(src_ctus, pred, cfg, tu_sizes, intra: bool = False):
    """Run the residual pipeline at each candidate TU size and pick per CTU
    by distortion + lambda_tu * nnz.  Exercises the 4/8/16/32 transforms
    (and their bit-exact MXU formulations) end-to-end.

    Returns (recon (n, 64, 64) uint8, tu_choice (n,) int32 index into
    tu_sizes, nnz () int32 of the selected blocks)."""
    import dataclasses

    from .loop import _residual_pipeline

    n = src_ctus.shape[0]
    lam = mv_lambda(cfg.qp)
    recs, costs, nnzs = [], [], []
    for tu in tu_sizes:
        c = dataclasses.replace(cfg, tu=tu)
        rec, _, cbf = _residual_pipeline(src_ctus, pred, c, intra=intra)
        k = (64 // tu) ** 2
        nnz_tu = cbf.reshape(n, k).sum(axis=-1)             # coded-TU count
        d = src_ctus.astype(jnp.int32) - rec.astype(jnp.int32)
        dist = jnp.sum(d * d, axis=(-2, -1))
        # rate proxy: coded-TU count scaled by TU area (coefficients cost)
        costs.append(dist + lam * nnz_tu * tu)
        recs.append(rec)
        nnzs.append(nnz_tu)
    costs = jnp.stack(costs, axis=-1)                       # (n, num_tu)
    choice = jnp.argmin(costs, axis=-1).astype(jnp.int32)
    recs = jnp.stack(recs, axis=1)                          # (n, num_tu, 64, 64)
    recon = jnp.take_along_axis(
        recs, choice[:, None, None, None], axis=1
    )[:, 0]
    nnz_sel = jnp.take_along_axis(
        jnp.stack(nnzs, axis=-1), choice[:, None], axis=-1
    )[:, 0]
    return recon, choice, jnp.sum(nnz_sel)
