"""Fused Pallas quarter-pel refinement kernel.

Per CTU, entirely in VMEM: 4 shared horizontal FIR passes, 16 vertical FIR
passes, 16 SAD scores, and a running argmin — emitting only the best
prediction and its fraction index.  This is the Pallas analogue of the
reference's width-specialised interp asm (pred_inter_a.asm:174-443) composed
with its own consumers' candidate scoring: one HBM read of (src, window), one
write of (pred, frac), no 16-candidate intermediate ever touching HBM.

Zero-coefficient taps are skipped at trace time (the kernel unrolls over
static fractions), so e.g. the copy row [0,0,0,64,0,0,0,0] costs one shift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pred_inter import KERNEL8

__all__ = ["refine_quarter_pel_fused"]

TAPS = 8


def _kernel(src_ref, win_ref, pred_ref, frac_ref, cost_ref, *, b):
    src = src_ref[0].astype(jnp.int32)           # (b, b)
    win = win_ref[0].astype(jnp.int32)           # (b+7, b+7)

    # Horizontal passes, one per xFrac, shared across yFrac (int16 wrap
    # matches the 8to16 intermediate store semantics, pred_inter.c:124).
    hp = []
    for xf in range(4):
        acc = None
        for k in range(TAPS):
            c = int(KERNEL8[xf][k])
            if c == 0:
                continue
            term = c * win[:, k : k + b]
            acc = term if acc is None else acc + term
        hp.append(acc.astype(jnp.int16).astype(jnp.int32))  # (b+7, b)

    best_cost = jnp.int32(1 << 30)
    best_pred = jnp.zeros((b, b), jnp.uint8)
    best_idx = jnp.int32(0)
    for yf in range(4):
        for xf in range(4):
            acc = None
            for k in range(TAPS):
                c = int(KERNEL8[yf][k])
                if c == 0:
                    continue
                term = c * hp[xf][k : k + b, :]
                acc = term if acc is None else acc + term
            pred = jnp.clip((acc + 2048) >> 12, 0, 255)
            cost = jnp.sum(jnp.abs(src - pred))
            better = cost < best_cost
            idx = yf * 4 + xf
            best_pred = jnp.where(better, pred.astype(jnp.uint8), best_pred)
            best_idx = jnp.where(better, jnp.int32(idx), best_idx)
            best_cost = jnp.where(better, cost, best_cost)

    pred_ref[0] = best_pred
    frac_ref[...] = best_idx.reshape(1, 1, 1)
    cost_ref[...] = best_cost.reshape(1, 1, 1)


@functools.partial(jax.jit, static_argnames=())
def refine_quarter_pel_fused(src_ctus: jnp.ndarray, windows: jnp.ndarray):
    """src_ctus (n, b, b) uint8, windows (n, b+7, b+7) uint8 at the integer
    MV.  Returns (pred (n, b, b) uint8, frac_idx (n,) int32 = yf*4+xf,
    cost (n,) int32), matching motion.refine_quarter_pel's selection
    (first-minimum tie-breaking) bit-exactly."""
    n, b, _ = src_ctus.shape
    kernel = functools.partial(_kernel, b=b)
    pred, frac, cost = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b + 7, b + 7), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, b, b), jnp.uint8),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(src_ctus, windows)
    return pred, frac[:, 0, 0], cost[:, 0, 0]


from .. import registry as _registry
from ..config import Tier as _Tier

_registry.register("refine_qpel", _Tier.PALLAS, refine_quarter_pel_fused)
