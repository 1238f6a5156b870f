"""The whole inter inner loop as ONE Pallas kernel per CTU group: full
search + quarter-pel refinement + residual pipeline, single VMEM residency.

`inter_impl="mega"`: per CTU, a (144, 256) uint8 slab is DMA'd from the
padded reference plane at the CTU's POSITION (known per frame — unlike
fused_dma's MV-dependent fetches, nothing here depends on data), double-
buffered across grid steps.  The slab covers both the +-R search window
and every possible quarter-pel refine window, so after the in-kernel SSD
grid + argmin the refine window is carved out of the already-resident slab
with two dynamic rotates — the reference plane is read from HBM exactly
once per CTU for the entire inner loop.

Geometry (r % 8 == 0, P = r + 8 pad, 64x64 CTUs):
  plane Pm = pad(ref, P top/left, >=80-P bottom, >=256-P... right), so
  ref[y, x] = Pm[y + P, x + P].  Slab rows = Pm[y0 : y0+144) (y0 % 8 == 0
  by CTU geometry); slab cols start at C = 128*floor((x0 + 5)/128) with
  dxc = x0 + 5 - C prefetched.  Within the slab:
    search window (128, 128) = rows [8:136), lanes rolled left by dxc + 3;
    refine window            = rows rolled left by 5 + dy*, lanes rolled
                               left by dxc + dx*   (dy*, dx* = argmin grid
                               indices = mv + R); used region (71, 71)
                               never touches roll wrap.

Composes the proven bodies: _chunked_body (search_pallas), _refine_core
and residual_core — bit-exact with inter_impl="stages"/"fused_dma" on TPU
and in interpret mode (tests/test_inter_fused.py).

MEASURED RESULT (v5e, 1080p, interleaved A/B): 1.83 ms/frame vs 1.08 for
the two-kernel search + fused_dma pipeline — the single-residency design
LOSES: the (144, 256) int32 slab conversion plus three full-slab dynamic
rotates per CTU add ~0.3 MB of VPU traffic each, and the monolithic body
forfeits the cross-kernel overlap XLA finds between the search kernel and
the DMA kernel.  Kept as a verified non-default mode: it is the minimum-
HBM-traffic design point (one plane read per CTU for the whole loop) and
the natural base if HBM bandwidth ever becomes the binding constraint
(e.g. much larger search ranges or many reference frames).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp_pallas import _fir_matrices, _refine_core
from .residual_pallas import block_diag_t8, residual_core
from .search_pallas import _band_ones, _chunked_body

__all__ = ["encode_ctu_mega"]

_LW = 128
_SLAB_R, _SLAB_C = 144, 256


def _mega_kernel(off_ref, src_ref, plane_ref, bx_ref, ay_ref, bd_ref,
                 pool_ref, band_ref, rec_ref, mvf_ref, nnz_ref, slab_scr,
                 sems, *, G, r, qscale, qshift, qoffset, dscale, dshift):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    num = 2 * r + 1

    def dma(step, slot, g):
        j = step * G + g
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(off_ref[j, 0] * 8, _SLAB_R),
                         pl.ds(off_ref[j, 1] * _LW, _SLAB_C)],
            slab_scr.at[slot, g],
            sems.at[slot, g],
        )

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        for g in range(G):
            dma(i, slot, g).start()

    @pl.when(i + 1 < nsteps)
    def _():
        for g in range(G):
            dma(i + 1, 1 - slot, g).start()

    for g in range(G):
        dma(i, slot, g).wait()

    for g in range(G):
        dxc = off_ref[i * G + g, 2]
        l32 = slab_scr[slot, g].astype(jnp.int32)            # (144, 256)

        # --- search -----------------------------------------------------
        wsearch = pltpu.roll(
            l32, (_SLAB_C - (dxc + 3)) % _SLAB_C, axis=1
        )[8 : 8 + _LW, :_LW]
        src32 = src_ref[g].astype(jnp.int32)
        ssd = _chunked_body(
            src32, wsearch, band_ref[...],
            b=64, num_dy=num, num_dx=num, wh=_LW, ww=_LW, chunks=8,
        )                                                    # [dx, dy]
        best = jnp.min(ssd)
        dxi = jax.lax.broadcasted_iota(jnp.int32, (num, num), 0)
        dyi = jax.lax.broadcasted_iota(jnp.int32, (num, num), 1)
        # tie-break = first minimum in [dy, dx] row-major, matching
        # motion.full_search's argmin over the flattened (num, num) grid.
        lin = dyi * num + dxi
        idx = jnp.min(jnp.where(ssd == best, lin, jnp.int32(1 << 30)))
        dy, dx = idx // num, idx % num                       # mv + R

        # --- refine window straight from the resident slab ---------------
        rwin = pltpu.roll(l32, (_SLAB_R - (5 + dy)) % _SLAB_R, axis=0)
        rwin = pltpu.roll(rwin, (_SLAB_C - (dxc + dx)) % _SLAB_C, axis=1)
        rwin = rwin[:_LW, :_LW]  # content beyond (71, 71) is inert garbage
        pred, fidx, cost = _refine_core(src32, rwin, bx_ref, ay_ref, b=64)

        # --- residual ----------------------------------------------------
        rec, cnt, _ = residual_core(
            src32, pred, bd_ref[...], pool_ref[...],
            qscale=qscale, qshift=qshift, qoffset=qoffset,
            dscale=dscale, dshift=dshift,
        )
        rec_ref[g] = rec.astype(jnp.uint8)
        # Scalars -> one (1, 8) lane vector via iota selects (Mosaic has no
        # scalar concatenate).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        mvf_ref[g] = (
            jnp.where(lane == 0, dy - r, 0)
            + jnp.where(lane == 1, dx - r, 0)
            + jnp.where(lane == 2, fidx, 0)
            + jnp.where(lane == 3, cost, 0)
            + jnp.where(lane == 4, best, 0)
        )
        nnz_ref[g] = cnt


@functools.partial(
    jax.jit,
    static_argnames=("r", "qscale", "qshift", "qoffset", "dscale", "dshift",
                     "group"),
)
def encode_ctu_mega(src_ctus, plane, positions, r, qscale, qshift, qoffset,
                    dscale, dshift, group: int = 2):
    """src_ctus (n, 64, 64) uint8; plane = pad(ref, P=r+8 top/left and the
    slack this wrapper adds) — pass the (P + h + ?, P + w + ?) plane whose
    [P:P+h, P:P+w] block is the reference frame (extra bottom/right pad is
    added here); positions (n, 2) int32 CTU (y0, x0) in ref coords.

    Returns (rec (n, 64, 64) uint8, mv (n, 2) int32 integer-pel,
    frac (n,) int32, best_ssd (n,) int32, nnz_tu (n, 8, 8) int32), with
    the same search/refine/residual semantics as inter_impl="stages".
    """
    n = src_ctus.shape[0]
    # Slab geometry: refine rows reach y0 + 2r + 75 < slab 144 rows needs
    # r <= 34; lane coverage needs dxc + 2r + 70 < 256 (dxc in {5, 69} for
    # 64-multiple x0 — holds for r <= 32).
    assert r % 8 == 0 and 8 <= r <= 32, "mega kernel covers r in {8,16,24,32}"
    p = r + 8
    hp, wp = plane.shape
    # Beyond the caller's symmetric P pad: rows reach (h-64)+144 needs
    # >= 80 - 2p extra; cols reach <= w + 197 needs >= 197 - 2p extra,
    # rounded so the padded width is a 128 multiple for the aligned DMA.
    need_r = max(0, 80 - 2 * p)
    need_c = max(0, 197 - 2 * p)
    need_c += -(wp + need_c) % _LW
    plane = jnp.pad(plane, ((0, need_r), (0, need_c)))

    G = min(group, n)
    steps = -(-n // G)
    pad_n = steps * G - n
    if pad_n:
        src_ctus = jnp.pad(src_ctus, ((0, pad_n), (0, 0), (0, 0)))
        positions = jnp.pad(positions, ((0, pad_n), (0, 0)))

    y0 = positions[:, 0]
    x0 = positions[:, 1]
    c = ((x0 + 5) // _LW) * _LW
    off = jnp.stack([y0 // 8, c // _LW, x0 + 5 - c], axis=-1)

    bx, ay = _fir_matrices(64)
    consts = (
        jnp.asarray(bx).astype(jnp.bfloat16),
        jnp.asarray(ay).astype(jnp.int8),
        jnp.asarray(block_diag_t8()).astype(jnp.bfloat16),
        jnp.asarray(np.kron(np.eye(8, dtype=np.float32),
                            np.ones((1, 8), np.float32))),
        jnp.asarray(_band_ones(64)),
    )
    kernel = functools.partial(
        _mega_kernel, G=G, r=r, qscale=qscale, qshift=qshift,
        qoffset=qoffset, dscale=dscale, dshift=dshift,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, 64, 64), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_LW, 256), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, _LW), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 64), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, 64, 64), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, 8), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, 8), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, G, _SLAB_R, _SLAB_C), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    rec, mvf, nnz = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((steps * G, 64, 64), jnp.uint8),
            jax.ShapeDtypeStruct((steps * G, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((steps * G, 8, 8), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(off, src_ctus, plane, *consts)
    mvf = mvf[:n, 0]
    return (rec[:n], mvf[:, 0:2], mvf[:, 2], mvf[:, 4], nnz[:n])
