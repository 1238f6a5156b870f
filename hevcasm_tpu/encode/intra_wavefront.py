"""Closed-loop intra encoding with wavefront parallelism.

SURVEY.md section 7 lists "dependent CTU ordering (wavefront dependencies)"
as the hardest part it defers; this module implements it.  True HEVC intra
predicts each block from *reconstructed* neighbours, creating the raster
dependency (left, above, above-right).  The TPU-native schedule is the WPP
wavefront: with wave index w = 2r + c every dependency of block (r, c) —
left (w-1), above (w-2), above-right (w-1... all strictly earlier waves —
so all blocks of a wave are independent and batch together:

    lax.scan over waves  x  vmapped block slots within a wave

Each wave gathers neighbour rows/columns from a reconstruction canvas,
evaluates all 35 intra modes batched, picks by SATD, runs the TU residual
pipeline, and scatters the reconstructed blocks back into the canvas.
Invalid slots write into a trash margin of the canvas.

(Note: dependencies of (r, c) are left (r, c-1) -> wave w-1, above (r-1, c)
-> w-2, above-right (r-1, c+1) -> w-1, above-left (r-1, c-1) -> w-3.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.pred_intra import filter_flag, pred_intra
from ..utils.psnr import psnr
from . import ctu as ctu_mod
from .loop import EncodeConfig, _prepare_intra_refs, _residual_pipeline, _satd_cost

__all__ = ["encode_intra_frame_wavefront"]

UNAVAILABLE = 128  # HEVC substitution value when no neighbour exists


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_intra_frame_wavefront(cur: jnp.ndarray, cfg: EncodeConfig = EncodeConfig()):
    """Closed-loop intra frame: 35-mode decision against *reconstructed*
    neighbours, WPP wave schedule.  cur (H, W) uint8; H, W multiples of
    cfg.intra_block."""
    h, w = cur.shape
    n = cfg.intra_block
    gr, gc = h // n, w // n
    slots = gr                        # one potential slot per block row
    num_waves = 2 * (gr - 1) + gc

    # Canvas layout: canvas[1 + y, 1 + x] == recon[y, x]; one border row/col
    # of UNAVAILABLE on top/left, a trash block row at the bottom for masked
    # slots, and 2n of slack on the right for the above-right neighbour run.
    ch, cw = 1 + h + n, 1 + w + 2 * n
    canvas0 = jnp.full((ch, cw), UNAVAILABLE, jnp.uint8)

    cur_pad = jnp.pad(cur, ((0, n), (0, 0)), mode="edge")  # trash-row source

    def wave_body(canvas, wv):
        r = jnp.arange(slots, dtype=jnp.int32)
        c = wv - 2 * r
        valid = (c >= 0) & (c < gc)
        rr = jnp.where(valid, r, gr)          # invalid slots -> trash row
        cc = jnp.clip(c, 0, gc - 1)
        y0 = 1 + rr * n                        # canvas coords
        x0 = 1 + cc * n

        def gather(y0i, x0i):
            above = jax.lax.dynamic_slice(canvas, (y0i - 1, x0i), (1, 2 * n))[0]
            left = jax.lax.dynamic_slice(canvas, (y0i, x0i - 1), (2 * n, 1))[:, 0]
            corner = jax.lax.dynamic_slice(canvas, (y0i - 1, x0i - 1), (1, 1))[0, 0]
            src = jax.lax.dynamic_slice(cur_pad, (y0i - 1, x0i - 1), (n, n))
            return above, left, corner, src

        above, left, corner, src = jax.vmap(gather)(y0, x0)

        # Availability under the wavefront coding order (8.4.4.2.2): the
        # left and above(-right) neighbours come from earlier waves, but the
        # below-left run belongs to wave w+1 and is never available.
        i = jnp.arange(2 * n, dtype=jnp.int32)[None, :]
        y_pix = rr[:, None] * n
        x_pix = cc[:, None] * n
        lav = (c[:, None] > 0) & (y_pix + i < h) & (i < n)
        aav = (rr[:, None] > 0) & (x_pix + i < w)
        cav = (c > 0) & (rr > 0)
        refs_plain, refs_filt = _prepare_intra_refs(
            left, above, corner, lav, aav, cav, n, cfg
        )

        preds, costs = [], []
        for mode in range(35):
            lt, ab, cn = refs_filt if filter_flag(mode, n) else refs_plain
            p = pred_intra(mode, lt, ab, cn, n, filter_edge=n < 32)
            preds.append(p)
            costs.append(_satd_cost(src, p))
        preds = jnp.stack(preds, axis=1)                   # (slots, 35, n, n)
        costs = jnp.stack(costs, axis=1)
        best = jnp.argmin(costs, axis=-1).astype(jnp.int32)
        pred = jnp.take_along_axis(preds, best[:, None, None, None], axis=1)[:, 0]

        # Invalid (masked) slots encode a zero residual so they contribute
        # nothing to the nnz statistic.
        src = jnp.where(valid[:, None, None], src, pred)
        rec, nnz, _ = _residual_pipeline(src, pred, cfg, intra=True)

        # Scatter the reconstructed blocks back into the canvas.
        dy = jax.lax.broadcasted_iota(jnp.int32, (slots, n, n), 1)
        dx = jax.lax.broadcasted_iota(jnp.int32, (slots, n, n), 2)
        ys = y0[:, None, None] + dy
        xs = x0[:, None, None] + dx
        canvas = canvas.at[ys, xs].set(rec)
        return canvas, nnz

    canvas, nnzs = jax.lax.scan(wave_body, canvas0, jnp.arange(num_waves, dtype=jnp.int32))
    recon = canvas[1 : 1 + h, 1 : 1 + w]
    return {
        "recon": recon,
        "nnz": jnp.sum(nnzs),
        "psnr_db": psnr(cur, recon),
    }
