"""Ablation profile of the chunked-K search kernel: times the full kernel
and variants with individual stages stubbed out, to attribute the gap
between the measured kernel and its ~0.18 ms/frame issued-matmul bound.

Diagnostics only; run on TPU:  python tools/ablate_search.py
"""

from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_encode import timed
from hevcasm_tpu.kernels.search_pallas import (
    _LW, _band_ones, _band_tree, _build_stack_chunked, _energy_mxu, _DN1)


def _body(si_u8, wi_u8, band, *, b, num, chunks, skip):
    Q = chunks
    h = b // Q
    wh = ww = b + num - 1
    si = si_u8.astype(jnp.int32) - 128
    wi = wi_u8.astype(jnp.int32) - 128
    wi = jnp.pad(wi, ((0, _LW - wh), (0, _LW - ww)))

    srcsq = jnp.sum(si * si)
    if "energy" in skip:
        eyt = jnp.zeros((_LW, _LW), jnp.int32)
    else:
        eyt = _energy_mxu(wi, band, b)

    sip = jnp.pad(si, ((0, 0), (0, _LW - b)))
    srcw8 = jnp.concatenate(
        [sip[q * h: (q + 1) * h] for q in range(Q)], axis=1
    ).astype(jnp.int8)
    if "stack" in skip:
        stk = jnp.tile(srcw8, (num, 1))
    else:
        stk = _build_stack_chunked(srcw8, num)

    if "rhs" in skip:
        rhs = jnp.tile(wi.astype(jnp.int8), (1, Q))
    else:
        rhs = jnp.concatenate(
            [(wi if q == 0 else pltpu.roll(wi, (_LW - q * h) % _LW, axis=0)
              ).astype(jnp.int8)
             for q in range(Q)],
            axis=1,
        )

    if "mm" in skip:
        g = jnp.zeros((num * h, _LW), jnp.int32) + jnp.sum(stk.astype(jnp.int32)) + jnp.sum(rhs.astype(jnp.int32))
    else:
        g = jax.lax.dot_general(stk, rhs, _DN1, preferred_element_type=jnp.int32)

    if "band" in skip:
        corr = jnp.sum(g.reshape(num, h, _LW), axis=1)[:, :num]
    else:
        corr = _band_tree(g, h, num, num, _LW)
    return srcsq + eyt[:num, :num] - 2 * corr


def kernel(src_ref, win_ref, band_ref, out_ref, *, b, num, chunks, group, skip):
    for gi in range(group):
        out_ref[gi] = _body(src_ref[gi], win_ref[gi], band_ref[...],
                            b=b, num=num, chunks=chunks, skip=skip)


def run(src, win, band, *, num, chunks, group, skip):
    n, b, _ = src.shape
    wh = b + num - 1
    G = group
    steps = -(-n // G)
    f = functools.partial(kernel, b=b, num=num, chunks=chunks, group=G,
                          skip=skip)
    return pl.pallas_call(
        f,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, wh, wh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, num, num), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * G, num, num), jnp.int32),
    )(src, win, band)


def main():
    import sys as _s
    b = int(_s.argv[1]) if len(_s.argv) > 1 else 64
    r = 32
    num = 2 * r + 1
    n = 510 * (64 // b) ** 2
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
    win = jnp.asarray(
        rng.integers(0, 256, (n, b + num - 1, b + num - 1), dtype=np.uint8))
    band = jnp.asarray(_band_ones(b))
    chunks = max(2, b // 8)
    for group in (2, 4, 8, 16):
        f = jax.jit(functools.partial(run, num=num, chunks=chunks, group=group,
                                      skip=()))
        jax.block_until_ready(f(src, win, band))
        t = timed(f, src, win, band, iters=40)
        print(f"full kernel      group={group}: {t*1e3:.3f} ms", flush=True)
    for skip in (("energy",), ("stack",), ("rhs",), ("band",), ("mm",),
                 ("stack", "rhs", "mm", "energy", "band")):
        f = jax.jit(functools.partial(run, num=num, chunks=chunks,
                                      group=max(2, 128 // b), skip=skip))
        jax.block_until_ready(f(src, win, band))
        t = timed(f, src, win, band, iters=40)
        print(f"skip {','.join(skip):28s}: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
