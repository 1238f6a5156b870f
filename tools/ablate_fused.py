"""Ablation profile of the fused refine+residual kernel (the r4 stage
budget's 0.48 ms): per-stage stubs attribute the time between the shared H
pass, per-CTU V matmuls, candidate scoring, quadrant extraction, and the
stacked residual pipeline.  Diagnostics only; run on TPU.
"""

from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__)), ))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_encode import timed
from hevcasm_tpu.kernels.interp_pallas import (
    _LW, _fir_matrices, _group_constants, _pad_group, _wrap16)
from hevcasm_tpu.kernels.residual_pallas import residual_core_stacked


def _group_body_ablate(src3, win3, bx_ref, ay_ref, bd_ref, bdg_ref,
                       poolg_ref, pool_ref, *, G, b, skip):
    rh = b + 8
    m4 = 4 * b
    wrows = win3.reshape(G * rh, _LW)
    if "h" in skip:
        inter_all = jnp.zeros((G * rh, m4), jnp.int32) + jnp.sum(wrows)
    else:
        inter_all = jax.lax.dot_general(
            wrows.astype(jnp.bfloat16), bx_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        inter_all = _wrap16(inter_all)

    ay = ay_ref[...]
    dn = (((1,), (0,)), ((), ()))
    preds_list, fracs, costs = [], [], []
    for g in range(G):
        inter = jnp.pad(inter_all[g * rh : (g + 1) * rh], ((0, _LW - rh), (0, 0)))
        if "v" in skip:
            preds = jnp.zeros((m4, m4), jnp.int32) + jnp.sum(inter)
        else:
            hi = (inter >> 8).astype(jnp.int8)
            lo = (jnp.bitwise_and(inter, 255) - 128).astype(jnp.int8)
            mh = jax.lax.dot_general(ay, hi, dn, preferred_element_type=jnp.int32)
            ml = jax.lax.dot_general(ay, lo, dn, preferred_element_type=jnp.int32)
            acc = 256 * mh + ml + 128 * 64
            preds = jnp.clip((acc + 2048) >> 12, 0, 255)

        src = src3[g]
        if "score" in skip:
            best_idx = jnp.int32(0)
            best_cost = jnp.sum(src)
        else:
            diff = jnp.abs(preds - jnp.tile(src, (4, 4)))
            rowsum = jnp.sum(diff.reshape(4, b, m4), axis=1)
            colsum = jnp.sum(rowsum.T.reshape(4, b, 4), axis=1)
            sad = colsum.T
            best_cost = jnp.min(sad)
            yy = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
            best_idx = jnp.min(jnp.where(sad == best_cost, yy * 4 + xx, 1 << 30))

        if "extract" in skip:
            preds_list.append(preds[:b, :b])
        else:
            yf, xf = best_idx // 4, best_idx % 4
            lw = max(m4, _LW)
            predsp = preds if m4 >= _LW else jnp.pad(preds, ((0, 0), (0, lw - m4)))
            sel = pltpu.roll(predsp, (m4 - yf * b) % m4, axis=0)
            sel = pltpu.roll(sel, (lw - xf * b) % lw, axis=1)
            preds_list.append(sel[:b, :b])
        fracs.append(best_idx)
        costs.append(best_cost)

    pred_stack = jnp.concatenate(preds_list, axis=0)
    src_stack = src3.reshape(G * b, b)
    if "residual" in skip:
        rec_stack = pred_stack + jnp.sum(src_stack)
        cnt = jnp.zeros((G * 8, 8), jnp.int32)
        bits = cnt
    else:
        rec_stack, cnt, bits = residual_core_stacked(
            src_stack, pred_stack, bd_ref[...], bdg_ref[...], poolg_ref[...],
            pool_ref[...], qscale=20560, qshift=23, qoffset=10880,
            dscale=1632, dshift=2,
        )
    return rec_stack, fracs, costs, cnt


def kernel(src_ref, win_ref, bx_ref, ay_ref, bd_ref, bdg_ref, poolg_ref,
           pool_ref, rec_ref, frac_ref, *, G, b, skip):
    src3 = src_ref[...].astype(jnp.int32)
    win3 = win_ref[...].astype(jnp.int32)
    rec_stack, fracs, costs, cnt = _group_body_ablate(
        src3, win3, bx_ref, ay_ref, bd_ref, bdg_ref, poolg_ref, pool_ref,
        G=G, b=b, skip=skip)
    rec_ref[...] = rec_stack.reshape(G, b, b).astype(jnp.uint8)
    frac_ref[...] = jnp.concatenate(
        [f.reshape(1, 1, 1) for f in fracs], axis=0)


def run(src, win, *, G, skip):
    n, b, _ = src.shape
    steps = -(-n // G)
    src = _pad_group(src, n, steps, G)
    win = _pad_group(win, n, steps, G)
    consts = _group_constants(G)
    f = functools.partial(kernel, G=G, b=b, skip=skip)
    return pl.pallas_call(
        f,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, b + 8, _LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, 4 * b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * b, _LW), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * b, G * b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 8, G * b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((steps * G, b, b), jnp.uint8),
            jax.ShapeDtypeStruct((steps * G, 1, 1), jnp.int32),
        ),
    )(src, win, *consts)


def main():
    n, b = 510, 64
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
    win = jnp.asarray(rng.integers(0, 256, (n, b + 8, _LW), dtype=np.uint8))
    for skip in ((), ("residual",), ("score",), ("extract",), ("v",),
                 ("h",), ("h", "v", "score", "extract", "residual")):
        f = jax.jit(functools.partial(run, G=6, skip=skip))
        jax.block_until_ready(f(src, win))
        t = timed(f, src, win, iters=40)
        print(f"skip {','.join(skip) or '(none)':34s}: {t*1e3:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
