"""Pallas motion-compensation kernels: standalone uni- and bi-prediction
at a GIVEN fractional offset per block.

The reference ships width-specialised SSE4 H/V/HV interpolation asm and a
fused bi-prediction pass (pred_inter_a.asm:174-443, :447-576); the fused
refine kernel (interp_pallas.py) covers the encoder's 16-candidate sweep,
and THESE kernels cover the decoder-shaped single-offset call — the PALLAS
tier of ops.pred_uni / ops.pred_bi.

TPU formulation: per grid step the scalar-prefetched (yfrac, xfrac) pair
drives the BlockSpec index_map of two stacked constant inputs, so the DMA
fetches exactly the banded FIR matrices of this block's fractions —
the data-driven analogue of the reference's [xFrac!=0][yFrac!=0] table
indexing (pred_inter.h:58-67), with zero in-kernel control flow:

  H:  win (h+8, LW) @ BX[xf] (LW, w)   bf16, exact (8-tap sums < 2^18),
      wrapped to int16 (pred_inter.c:124).
  V:  AY[yf] (h, LW) @ inter (LW, w)   two s8 matmuls over the hi /
      (lo-128) byte split (every HEVC phase sums to 64, so the offset
      folds into a constant).

Bi-prediction runs both paths in one kernel and fuses the combining mean
(r0 + r1 + 64) >> 7 (pred_inter.c:490-530) — the Pallas analogue of the
reference's fused SSE4 bi pass.  Both the 8-tap luma quarter-pel and the
4-tap chroma eighth-pel filter families are covered (the stacked constant
simply has 4 or 8 phase planes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import registry
from ..config import Tier
from ..ops.pred_inter import KERNEL4, KERNEL8

__all__ = ["pred_uni_pallas", "pred_bi_pallas"]

_LW = 128


def _banded(coef, in_len: int, out_len: int) -> np.ndarray:
    taps = len(coef)
    b = np.zeros((in_len, out_len), np.int32)
    for o in range(out_len):
        b[o : o + taps, o] = coef
    return b


@functools.lru_cache
def _mc_matrices(h: int, w: int, taps: int):
    """(BX (phases, LW, w) float32-able, AY (phases, h, LW) int8) stacked
    per-frac banded FIR matrices — 4 quarter-pel phases for the 8-tap luma
    family, 8 eighth-pel phases for the 4-tap chroma family — indexed by
    the scalar-prefetched fractions."""
    kern = KERNEL8 if taps == 8 else KERNEL4
    bx = np.stack([_banded(kern[f], _LW, w) for f in range(len(kern))])
    ay = np.stack([_banded(kern[f], _LW, h).T for f in range(len(kern))])
    return bx, ay


def _interp_core(win, bx, ay, h):
    """One H+V pass: win (h+8, LW) int32, bx (LW, w), ay (h, LW).
    Returns the raw V accumulation (h, w) int32 (unshifted)."""
    inter = jax.lax.dot_general(
        win.astype(jnp.bfloat16), bx.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    inter = (inter << 16) >> 16                       # int16 intermediate
    inter = jnp.pad(inter, ((0, _LW - inter.shape[0]), (0, 0)))
    hi = (inter >> 8).astype(jnp.int8)
    lo = (jnp.bitwise_and(inter, 255) - 128).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    mh = jax.lax.dot_general(ay, hi, dn, preferred_element_type=jnp.int32)
    ml = jax.lax.dot_general(ay, lo, dn, preferred_element_type=jnp.int32)
    return 256 * mh + ml + 128 * 64                   # sum(coef) == 64


def _pad_windows(windows, h, taps):
    n, wh, ww = windows.shape
    if ww > _LW:
        # Wider-than-slab geometry: NotImplementedError (not a bare assert)
        # so registry-level tier substitution can degrade to the REF tier,
        # which handles any width (ADVICE r3).
        raise NotImplementedError(
            f"mc_pallas covers w + taps - 1 <= {_LW} (got {ww})")
    assert wh >= h + taps - 1
    rh = h + taps  # aligned row count (h + taps - 1 rounded up by 1)
    return jnp.pad(windows, ((0, 0), (0, max(0, rh - wh)),
                             (0, _LW - ww)))[:, :rh]


def _flatten_lead(window):
    """(..., wh, ww) -> ((n, wh, ww), unflatten) handling any leading batch
    dims, matching the REF ops' contract (ADVICE r3)."""
    lead = window.shape[:-2]
    flat = window.reshape((-1,) + window.shape[-2:])
    def unflatten(out):
        return out.reshape(lead + out.shape[-2:])
    return flat, unflatten


def _uni_kernel(fr, win_ref, bx_ref, ay_ref, out_ref, *, h):
    acc = _interp_core(win_ref[0].astype(jnp.int32), bx_ref[0], ay_ref[0], h)
    out_ref[0] = jnp.clip((acc + 2048) >> 12, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("h", "w", "taps"))
def pred_uni_pallas_batched(windows, xfrac, yfrac, h: int, w: int,
                            taps: int = 8):
    """windows (n, >=h+taps-1, w+taps-1<=LW) uint8, per-block fractions
    -> (n, h, w) uint8, bit-exact with ops.pred_uni."""
    n = windows.shape[0]
    windows = _pad_windows(windows, h, taps)
    bxs, ays = _mc_matrices(h, w, taps)
    fr = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(yfrac, jnp.int32), (n,)),
         jnp.broadcast_to(jnp.asarray(xfrac, jnp.int32), (n,))], axis=-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + taps, _LW), lambda i, fr: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LW, w), lambda i, fr: (fr[i, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, _LW), lambda i, fr: (fr[i, 0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i, fr: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_uni_kernel, h=h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        interpret=jax.default_backend() != "tpu",
    )(fr, windows, jnp.asarray(bxs, jnp.float32),
      jnp.asarray(ays).astype(jnp.int8))


def pred_uni_pallas(window, xfrac, yfrac, taps: int = 8):
    """PALLAS tier of ops.pred_uni (8-tap luma quarter-pel or 4-tap
    chroma eighth-pel).  Accepts the REF signature: window
    (..., h+taps-1, w+taps-1), int or per-block traced fractions."""
    window, unflatten = _flatten_lead(window)
    h, w = window.shape[-2] - taps + 1, window.shape[-1] - taps + 1
    if jnp.ndim(xfrac):
        xfrac = jnp.reshape(xfrac, (-1,))
    if jnp.ndim(yfrac):
        yfrac = jnp.reshape(yfrac, (-1,))
    out = pred_uni_pallas_batched(window, xfrac, yfrac, h, w, taps)
    return unflatten(out)


def _bi_kernel(fr, w0_ref, w1_ref, bx0_ref, ay0_ref, bx1_ref, ay1_ref,
               out_ref, *, h):
    a0 = _interp_core(w0_ref[0].astype(jnp.int32), bx0_ref[0], ay0_ref[0], h)
    a1 = _interp_core(w1_ref[0].astype(jnp.int32), bx1_ref[0], ay1_ref[0], h)
    # Each uni path stores an int16 (acc >> 6) intermediate
    # (pred_inter.c:514-523), then the fused combining mean.
    r0 = ((a0 >> 6) << 16) >> 16
    r1 = ((a1 >> 6) << 16) >> 16
    out_ref[0] = jnp.clip((r0 + r1 + 64) >> 7, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("h", "w", "taps"))
def pred_bi_pallas_batched(w0, w1, xf0, yf0, xf1, yf1, h: int, w: int,
                           taps: int = 8):
    n = w0.shape[0]
    w0 = _pad_windows(w0, h, taps)
    w1 = _pad_windows(w1, h, taps)
    bxs, ays = _mc_matrices(h, w, taps)
    br = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.int32), (n,))
    fr = jnp.stack([br(yf0), br(xf0), br(yf1), br(xf1)], axis=-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + taps, _LW), lambda i, fr: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + taps, _LW), lambda i, fr: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LW, w), lambda i, fr: (fr[i, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, _LW), lambda i, fr: (fr[i, 0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LW, w), lambda i, fr: (fr[i, 3], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, _LW), lambda i, fr: (fr[i, 2], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i, fr: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_bi_kernel, h=h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        interpret=jax.default_backend() != "tpu",
    )(fr, w0, w1, jnp.asarray(bxs, jnp.float32),
      jnp.asarray(ays).astype(jnp.int8), jnp.asarray(bxs, jnp.float32),
      jnp.asarray(ays).astype(jnp.int8))


def pred_bi_pallas(window0, window1, xfrac0, yfrac0, xfrac1, yfrac1,
                   taps: int = 8):
    """PALLAS tier of ops.pred_bi: fused dual-path interpolation +
    combining mean, both filter families."""
    window0, unflatten = _flatten_lead(window0)
    window1, _ = _flatten_lead(window1)
    h = window0.shape[-2] - taps + 1
    w = window0.shape[-1] - taps + 1
    fr = [jnp.reshape(f, (-1,)) if jnp.ndim(f) else f
          for f in (xfrac0, yfrac0, xfrac1, yfrac1)]
    out = pred_bi_pallas_batched(window0, window1, *fr, h, w, taps)
    return unflatten(out)


registry.register("pred_uni", Tier.PALLAS, pred_uni_pallas)
registry.register("pred_bi", Tier.PALLAS, pred_bi_pallas)
