"""Motion estimation: batched full-search + quarter-pel refinement.

The reference provides only the per-block SAD primitives and leaves the
search to client encoders (SURVEY.md section 3.2).  Here the whole frame's
CTUs search in one batched call:

  1. integer full search: sad_grid over a (2R+1)^2 candidate grid per CTU;
  2. quarter-pel refinement: the 16 (xFrac, yFrac) interpolations at the best
     integer MV, evaluated with the unified pred_uni path and scored by SAD.

All shapes static; MVs are traced values (gathers), so the whole pipeline
jits into one program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sad import sad, sad_grid
from ..ops.pred_inter import pred_uni

__all__ = [
    "ctu_positions",
    "extract_windows",
    "full_search",
    "refine_quarter_pel",
    "grid_metric_fn",
]


def grid_metric_fn(metric: str):
    """Best available grid-scoring implementation for a metric name.

    "sad": reference-faithful |a-b| grid; "ssd": squared-error grid, whose
    optimized tier rides the MXU (kernels/xla_opt.ssd_grid, exact integers).
    """
    from .. import registry  # late import: kernels register on package load

    op = {"sad": "sad_grid", "ssd": "ssd_grid"}[metric]
    fn = registry.get(op)
    assert fn is not None, f"no implementation for {op}"
    return fn

TAPS = 8
PAD_L = TAPS // 2 - 1  # 3
PAD_R = TAPS // 2      # 4


def ctu_positions(grid_rows: int, grid_cols: int, ctu: int) -> jnp.ndarray:
    """(n, 2) [y, x] pixel positions of each CTU, row-major."""
    r = jnp.arange(grid_rows) * ctu
    c = jnp.arange(grid_cols) * ctu
    yy, xx = jnp.meshgrid(r, c, indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1).astype(jnp.int32)


def extract_windows(plane: jnp.ndarray, positions: jnp.ndarray, size: int) -> jnp.ndarray:
    """Gather a (size, size) window at each position from a 2-D plane.

    positions are top-left coords into `plane`.  Returns (n, size, size).
    """

    def one(pos):
        return jax.lax.dynamic_slice(plane, (pos[0], pos[1]), (size, size))

    return jax.vmap(one)(positions)


def full_search(
    src_ctus: jnp.ndarray,
    ref_padded: jnp.ndarray,
    positions: jnp.ndarray,
    search_range: int,
    grid_fn=sad_grid,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Integer-pel full search.

    src_ctus:   (n, B, B) current-frame CTUs.
    ref_padded: reference plane padded by (R + PAD_L) top/left and
                (R + PAD_R) bottom/right (see pad amounts in loop.py).
    positions:  (n, 2) CTU pixel positions in unpadded coords.
    grid_fn:    sad_grid implementation (REF or a Pallas tier).

    Returns (mvs, best_sad): mvs (n, 2) integer-pel [dy, dx] in [-R, R],
    best_sad (n,) int32.
    """
    b = src_ctus.shape[-1]
    r = search_range
    num = 2 * r + 1
    # Search window top-left in padded coords: (y0 - R) + (R + PAD_L).
    win = extract_windows(ref_padded, positions + PAD_L, b + 2 * r)
    sads = grid_fn(src_ctus, win, num, num)  # (n, num, num)
    flat = sads.reshape(sads.shape[0], -1)
    best = jnp.argmin(flat, axis=-1).astype(jnp.int32)
    best_sad = jnp.take_along_axis(flat, best[:, None], axis=-1)[:, 0]
    mv = jnp.stack([best // num - r, best % num - r], axis=-1)
    return mv, best_sad


def refine_quarter_pel(
    src_ctus: jnp.ndarray,
    ref_padded: jnp.ndarray,
    positions: jnp.ndarray,
    mv_int: jnp.ndarray,
    search_range: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate the 16 quarter-pel fractional offsets at the best integer MV
    and return (pred, mv_qpel, windows).

    pred:   (n, B, B) uint8 best interpolated prediction
    mv_qpel:(n, 2) motion vectors in quarter-pel units (mv_int*4 + frac)
    """
    b = src_ctus.shape[-1]
    # Interp window top-left (unpadded): y0 + dy - PAD_L; padded offset
    # +(R + PAD_L) makes it y0 + dy + R >= 0.
    start = positions + mv_int + search_range
    win = extract_windows(ref_padded, start, b + TAPS - 1)  # (n, B+7, B+7)

    preds, costs = [], []
    for yf in range(4):
        for xf in range(4):
            p = pred_uni(win, xf, yf, TAPS)  # (n, B, B)
            preds.append(p)
            costs.append(sad(src_ctus, p))
    preds = jnp.stack(preds, axis=1)         # (n, 16, B, B)
    costs = jnp.stack(costs, axis=1)         # (n, 16)
    best = jnp.argmin(costs, axis=-1).astype(jnp.int32)  # (n,)
    pred = jnp.take_along_axis(preds, best[:, None, None, None], axis=1)[:, 0]
    yfrac, xfrac = best // 4, best % 4
    mv_qpel = mv_int * 4 + jnp.stack([yfrac, xfrac], axis=-1)
    return pred, mv_qpel, win
