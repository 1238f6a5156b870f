"""Round-5 search-kernel experiment: software-pipelined group loop.

The r4 kernel measures ~0.47 ms/frame with ~0.30 ms of VPU work (stack
build, rhs build, band tree, energy glue) and ~0.20 ms of MXU work
(correlation + energy matmuls) — i.e. the two units run essentially
SERIALLY.  The per-group-member dependency chain is
build -> matmul -> band, and the r4 body emits it in that order member by
member, so the VPU band of member i waits on the matmul of member i while
nothing else is ready to issue.

This experiment reorders the unrolled group loop into a software pipeline:

    for gi:  energy(gi); build(gi); issue matmul(gi); band(gi-1)

so the band/combine of the previous member (VPU) is available to execute
while the current member's matmul occupies the MXU.  Bit-exactness is
checked against the committed kernel.

Also re-tests the in-kernel argmin (search_impl='mv' analogue) under the
pipelined arrangement: r4 measured it slower in the serial body, where its
VPU reduction extended the critical path; with MXU/VPU overlap it may ride
free and save the (n, 65, 65) grid HBM round trip.

Diagnostics only; run on TPU:  python tools/exp_r5_search.py
"""

from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__)), ".."))
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_encode import timed
from hevcasm_tpu.kernels.search_pallas import (
    _LW, _band_ones, _band_tree, _build_stack_chunked, _energy_mxu, _DN1,
    _argmin_mv, _prep_src_chunked, _prep_win_i8, ssd_grid)


def _member_front(src_ref, win_ref, band_ref, gi, *, b, num_dx, chunks):
    """Everything up to and including the matmul for member gi."""
    Q = chunks
    h = b // Q
    rows4 = _LW // 4
    wi = win_ref[gi].astype(jnp.int32)
    eyt = _energy_mxu(wi, band_ref[...], b)
    stk = _build_stack_chunked(src_ref[gi], num_dx)
    wp = pltpu.bitcast(win_ref[gi], jnp.int32)
    rhs = pltpu.bitcast(
        jnp.concatenate(
            [wp if q == 0 else
             pltpu.roll(wp, (rows4 - q * h // 4) % rows4, axis=0)
             for q in range(Q)],
            axis=1,
        ),
        jnp.int8,
    )
    g = jax.lax.dot_general(stk, rhs, _DN1, preferred_element_type=jnp.int32)
    return g, eyt


def _kernel_pipe(src_ref, win_ref, sq_ref, band_ref, out_ref, *, b, h,
                 num_dx, num_dy, chunks, group, argmin):
    pend = None
    for gi in range(group):
        g, eyt = _member_front(src_ref, win_ref, band_ref, gi,
                               b=b, num_dx=num_dx, chunks=chunks)
        if pend is not None:
            pgi, pg, peyt = pend
            corr = _band_tree(pg, h, num_dx, num_dy, _LW)
            ssd = sq_ref[pgi, 0, 0] + peyt[:num_dx, :num_dy] - 2 * corr
            out_ref[pgi] = _argmin_mv(ssd, num_dx) if argmin else ssd
        pend = (gi, g, eyt)
    pgi, pg, peyt = pend
    corr = _band_tree(pg, h, num_dx, num_dy, _LW)
    ssd = sq_ref[pgi, 0, 0] + peyt[:num_dx, :num_dy] - 2 * corr
    out_ref[pgi] = _argmin_mv(ssd, num_dx) if argmin else ssd


def _kernel_serial(src_ref, win_ref, sq_ref, band_ref, out_ref, *, b, h,
                   num_dx, num_dy, chunks, group, argmin):
    for gi in range(group):
        g, eyt = _member_front(src_ref, win_ref, band_ref, gi,
                               b=b, num_dx=num_dx, chunks=chunks)
        corr = _band_tree(g, h, num_dx, num_dy, _LW)
        ssd = sq_ref[gi, 0, 0] + eyt[:num_dx, :num_dy] - 2 * corr
        out_ref[gi] = _argmin_mv(ssd, num_dx) if argmin else ssd


@functools.partial(jax.jit, static_argnames=("num", "chunks", "group",
                                             "pipe", "argmin"))
def run(src, window, num, chunks=8, group=4, pipe=True, argmin=False):
    n, b, _ = src.shape
    wh = ww = b + num - 1
    h = b // chunks
    G = min(group, n)
    steps = -(-n // G)
    pad = steps * G - n
    if pad:
        src = jnp.pad(src, ((0, pad), (0, 0), (0, 0)))
        window = jnp.pad(window, ((0, pad), (0, 0), (0, 0)))
    si = src.astype(jnp.int32) - 128
    srcsq = jnp.sum(si * si, axis=(1, 2)).reshape(-1, 1, 1)
    srcc = _prep_src_chunked(src, b, h, chunks)
    win8 = _prep_win_i8(window, wh, ww)
    body = _kernel_pipe if pipe else _kernel_serial
    kernel = functools.partial(
        body, b=b, h=h, num_dx=num, num_dy=num, chunks=chunks, group=G,
        argmin=argmin,
    )
    od = (G, 1, 8) if argmin else (G, num, num)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, h, chunks * _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, _LW, _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(od, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * G,) + od[1:], jnp.int32),
    )(srcc, win8, srcsq, jnp.asarray(_band_ones(b)))[:n]
    if argmin:
        return out[:, 0]
    return jnp.swapaxes(out, 1, 2)


def main():
    b, r = 64, 32
    num = 2 * r + 1
    n = 510
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
    win = jnp.asarray(
        rng.integers(0, 256, (n, b + num - 1, b + num - 1), dtype=np.uint8))

    # correctness vs the committed kernel
    ref = np.asarray(ssd_grid(src, win, num, num))
    got = np.asarray(run(src, win, num, pipe=True, group=4))
    assert np.array_equal(ref, got), "pipelined kernel mismatch"
    print("bit-exact vs committed ssd_grid: OK", flush=True)

    base = jax.jit(functools.partial(ssd_grid, num_dy=num, num_dx=num))
    jax.block_until_ready(base(src, win))
    t = timed(base, src, win, iters=40)
    print(f"committed ssd_grid (prep=xla, auto group): {t*1e3:.3f} ms", flush=True)

    for pipe in (False, True):
        for group in (2, 4, 8):
            f = jax.jit(functools.partial(run, num=num, group=group,
                                          pipe=pipe, argmin=False))
            jax.block_until_ready(f(src, win))
            t = timed(f, src, win, iters=40)
            print(f"pipe={int(pipe)} group={group}: {t*1e3:.3f} ms", flush=True)
    for group in (4, 8):
        f = jax.jit(functools.partial(run, num=num, group=group,
                                      pipe=True, argmin=True))
        jax.block_until_ready(f(src, win))
        t = timed(f, src, win, iters=40)
        print(f"pipe=1 group={group} argmin-in-kernel: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
