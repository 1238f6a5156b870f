"""Round-5 fused-kernel scoring experiment.

The r5 trace attributes ~0.2 ms/frame of the fused refine+residual kernel
to candidate scoring, and most of that chain is MATERIALIZING the clipped
8-bit predictions (add, shift, min, max over the (256, 256) candidate
plane) before the |pred - src| SAD.  Variant "raw" scores the candidates
on the pre-clip accumulator instead:

    score = sum_px |acc + 2048 - 4096*src| >> 4

a finer-grained distortion measure (12 extra fractional bits, coarsened
by 4 to keep the CTU sum in int32) that needs only sub/abs/shift, and
clips/shifts ONLY the winning quadrant after extraction.  This changes
which fraction wins on near-ties, so it is a metric change that every
tier must adopt together if productized.

Variant "rawmm" additionally pushes the score reductions onto the MXU
(bf16 ones-matmuls over the hi/lo byte split; exact).

Diagnostics only; run on TPU:  python tools/exp_r5_fusedscore.py
"""

from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_encode import timed
from hevcasm_tpu.kernels.interp_pallas import (
    _LW, _fir_matrices, _group_constants, _pad_group, _wrap16)
from hevcasm_tpu.kernels.residual_pallas import residual_core_stacked


def _group_body_variant(src3, win3, bx_ref, ay_ref, bd_ref, bdg_ref,
                        poolg_ref, pool_ref, *, G, b, variant):
    rh = b + 8
    m4 = 4 * b
    wrows = win3.reshape(G * rh, _LW)
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
        hi = (inter >> 8).astype(jnp.int8)
        lo = (jnp.bitwise_and(inter, 255) - 128).astype(jnp.int8)
        mh = jax.lax.dot_general(ay, hi, dn, preferred_element_type=jnp.int32)
        ml = jax.lax.dot_general(ay, lo, dn, preferred_element_type=jnp.int32)
        acc = 256 * mh + ml + 128 * 64 + 2048          # rounding folded in

        src = src3[g]
        if variant == "base":
            preds = jnp.clip(acc >> 12, 0, 255)
            diff = jnp.abs(preds - jnp.tile(src, (4, 4)))
            rowsum = jnp.sum(diff.reshape(4, b, m4), axis=1)
            colsum = jnp.sum(rowsum.T.reshape(4, b, 4), axis=1)
            sad = colsum.T
        else:
            s4 = jnp.tile(src << 12, (4, 4))
            diff = jnp.abs(acc - s4) >> 4
            rowsum = jnp.sum(diff.reshape(4, b, m4), axis=1)
            if variant == "rawfast":
                # In-lane-block tree sum (6 masked roll-adds on (4, 256));
                # the block total lands on lane xf*b; no transpose.
                lane = jax.lax.broadcasted_iota(jnp.int32, (4, m4), 1)
                o = jnp.bitwise_and(lane, b - 1)
                t = rowsum
                sh = 1
                while sh < b:
                    rolled = pltpu.roll(t, (m4 - sh) % m4, axis=1)
                    t = t + jnp.where((o & sh) == 0, rolled, 0)
                    sh *= 2
                sadp = jnp.where(o == 0, t, 1 << 30)   # (4, m4): [yf, xf*b]
                best_cost = jnp.min(sadp)
                yy4 = jax.lax.broadcasted_iota(jnp.int32, (4, m4), 0)
                lin = yy4 * 4 + jax.lax.div(lane, b)
                best_idx = jnp.min(
                    jnp.where(sadp == best_cost, lin, 1 << 30))
                sad = None
            else:
                colsum = jnp.sum(rowsum.T.reshape(4, b, 4), axis=1)
                sad = colsum.T

        if sad is not None:
            best_cost = jnp.min(sad)
            yy = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
            best_idx = jnp.min(jnp.where(sad == best_cost, yy * 4 + xx, 1 << 30))

        yf, xf = best_idx // 4, best_idx % 4
        lw = max(m4, _LW)
        if variant == "base":
            plane = preds
        else:
            plane = acc
        planep = plane if m4 >= _LW else jnp.pad(plane, ((0, 0), (0, lw - m4)))
        sel = pltpu.roll(planep, (m4 - yf * b) % m4, axis=0)
        sel = pltpu.roll(sel, (lw - xf * b) % lw, axis=1)
        sel = sel[:b, :b]
        if variant != "base":
            sel = jnp.clip(sel >> 12, 0, 255)
        preds_list.append(sel)
        fracs.append(best_idx)
        costs.append(best_cost)

    pred_stack = jnp.concatenate(preds_list, axis=0)
    src_stack = src3.reshape(G * b, b)
    rec_stack, cnt, bits = residual_core_stacked(
        src_stack, pred_stack, bd_ref[...], bdg_ref[...], poolg_ref[...],
        pool_ref[...], qscale=26214, qshift=24, qoffset=85 << 7,
        dscale=2880, dshift=2,
    )
    return rec_stack, fracs, costs, cnt


def kernel(src_ref, win_ref, bx_ref, ay_ref, bd_ref, bdg_ref, poolg_ref,
           pool_ref, rec_ref, frac_ref, *, G, b, variant):
    src3 = src_ref[...].astype(jnp.int32)
    win3 = win_ref[...].astype(jnp.int32)
    rec_stack, fracs, costs, cnt = _group_body_variant(
        src3, win3, bx_ref, ay_ref, bd_ref, bdg_ref, poolg_ref, pool_ref,
        G=G, b=b, variant=variant)
    rec_ref[...] = rec_stack.reshape(G, b, b).astype(jnp.uint8)
    frac_ref[...] = jnp.concatenate(
        [f.reshape(1, 1, 1) for f in fracs], axis=0)


def run(src, win, *, G, variant):
    n, b, _ = src.shape
    steps = -(-n // G)
    src = _pad_group(src, n, steps, G)
    win = _pad_group(win, n, steps, G)
    consts = _group_constants(G)
    f = functools.partial(kernel, G=G, b=b, variant=variant)
    rec, frac = pl.pallas_call(
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
    return rec[:n], frac[:n, 0, 0]


def main():
    rng = np.random.default_rng(0)
    n, b = 510, 64
    src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
    win = jnp.asarray(rng.integers(0, 256, (n, b + 8, _LW), dtype=np.uint8))

    outs = {}
    for variant in ("base", "raw", "rawfast"):
        f = jax.jit(functools.partial(run, G=6, variant=variant))
        rec, frac = jax.block_until_ready(f(src, win))
        outs[variant] = (np.asarray(rec), np.asarray(frac))
        t = timed(f, src, win, iters=40)
        print(f"variant {variant:6s}: {t*1e3:.3f} ms", flush=True)
    same = np.mean(outs["base"][1] == outs["raw"][1])
    print(f"fraction agreement base vs raw: {same*100:.1f}% "
          f"(random content; near-ties may flip)", flush=True)
    agree = np.array_equal(outs["raw"][1], outs["rawfast"][1])
    recs = np.array_equal(outs["raw"][0], outs["rawfast"][0])
    print(f"rawfast bit-exact vs raw: frac={agree} rec={recs}", flush=True)


if __name__ == "__main__":
    main()
