"""Micro-benchmark: does Mosaic execute int8 element-wise ops at packed
(4-per-lane) rate vs int32?  Decides whether the fused kernel's candidate
scoring should move to the uint8 domain.

Also times dynamic rolls of a (256, 256) plane in the int32 domain vs the
bitcast-packed (64, 256) int32 domain (the quadrant-extraction pattern).

Diagnostics only; run on TPU:  python tools/exp_r5_int8vpu.py
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


def _absdiff_kernel(a_ref, b_ref, o_ref, *, reps, dtype):
    a = a_ref[...]
    b = b_ref[...]
    acc = a
    if str(a.dtype) == "int8":
        # max/min don't legalize on i8 vectors; measure the legal-op rate
        # with an add/xor/sub chain of the same op count.
        for _ in range(reps):
            d = (acc ^ b) - (acc & b)
            acc = (d + a) ^ (d - a)
    else:
        for _ in range(reps):
            d = jnp.maximum(acc, b) - jnp.minimum(acc, b)
            acc = jnp.maximum(d, a) - jnp.minimum(d, a)
    o_ref[...] = acc


def run_absdiff(a, b, reps):
    return pl.pallas_call(
        functools.partial(_absdiff_kernel, reps=reps, dtype=a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
    )(a, b)


def _roll_kernel(a_ref, s_ref, o_ref, *, reps, packed):
    a = a_ref[...]
    sh = s_ref[0]
    if packed:
        a = pltpu.bitcast(a, jnp.int32)
    for _ in range(reps):
        a = pltpu.roll(a, sh, axis=1)
        a = pltpu.roll(a, sh, axis=0)
    if packed:
        a = pltpu.bitcast(a, jnp.uint8)
    o_ref[...] = a


def run_roll(a, s, reps, packed):
    return pl.pallas_call(
        functools.partial(_roll_kernel, reps=reps, packed=packed),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint8),
    )(a, s)


def main():
    rng = np.random.default_rng(0)
    n = 510  # one "CTU" plane per grid-free call; big enough to time
    shape = (8 * 256, 256)  # ~8 CTUs worth of candidate plane per call
    a32 = jnp.asarray(rng.integers(0, 256, shape, dtype=np.int32))
    b32 = jnp.asarray(rng.integers(0, 256, shape, dtype=np.int32))
    a8 = (a32 - 128).astype(jnp.int8)
    b8 = (b32 - 128).astype(jnp.int8)
    a16 = a32.astype(jnp.int16)
    b16 = b32.astype(jnp.int16)

    for reps in (16,):
        for name, (x, y) in (("int32", (a32, b32)),
                             ("int16", (a16, b16))):
            f = jax.jit(functools.partial(run_absdiff, reps=reps))
            jax.block_until_ready(f(x, y))
            t = timed(f, x, y, iters=60)
            ops = reps * 4 * shape[0] * shape[1]
            print(f"absdiff {name}: {t*1e3:.3f} ms  "
                  f"({ops/t/1e12:.2f} T el-op/s)", flush=True)

    plane = jnp.asarray(rng.integers(0, 256, (8 * 256, 256), dtype=np.uint8))
    s = jnp.asarray([64], jnp.int32)
    for packed in (False, True):
        f = jax.jit(functools.partial(run_roll, reps=8, packed=packed))
        jax.block_until_ready(f(plane, s))
        t = timed(f, plane, s, iters=60)
        print(f"roll packed={int(packed)}: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
