"""Floor + group sweep for the fused refine+residual kernel.

Times (a) a pass-through kernel with the same BlockSpecs as
inter_ctu_fused_batched (reads src + window, writes rec = src row) — the
pure grid/copy pipeline cost — and (b) the real kernel across group sizes.

Diagnostics only; run on TPU:  python tools/exp_r5_fusedfloor.py
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
from hevcasm_tpu.kernels.interp_pallas import _LW, _pad_group, \
    inter_ctu_fused_batched


def _pass_kernel(src_ref, win_ref, rec_ref, *, G, b):
    s = src_ref[...].astype(jnp.int32)
    w = win_ref[...].astype(jnp.int32)
    rec_ref[...] = (s + w[:, :b, :b]).astype(jnp.uint8)


def run_floor(src, win, *, G):
    n, b, _ = src.shape
    steps = -(-n // G)
    src = _pad_group(src, n, steps, G)
    win = _pad_group(win, n, steps, G)
    f = functools.partial(_pass_kernel, G=G, b=b)
    rec = pl.pallas_call(
        f,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, b + 8, _LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * G, b, b), jnp.uint8),
    )(src, win)
    return rec[:n]


def main():
    rng = np.random.default_rng(0)
    n, b = 510, 64
    src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
    win = jnp.asarray(rng.integers(0, 256, (n, b + 8, _LW), dtype=np.uint8))

    for G in (6, 12):
        f = jax.jit(functools.partial(run_floor, G=G))
        jax.block_until_ready(f(src, win))
        t = timed(f, src, win, iters=60)
        print(f"pass-through floor G={G}: {t*1e3:.3f} ms", flush=True)

    for G in (4, 6, 8, 10, 12):
        f = jax.jit(functools.partial(
            inter_ctu_fused_batched, qscale=26214, qshift=24,
            qoffset=85 << 7, dscale=2880, dshift=2, group=G))
        jax.block_until_ready(f(src, win))
        t = timed(f, src, win, iters=40)
        print(f"real kernel G={G}: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
