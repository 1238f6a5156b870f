"""Pallas TPU kernels for the SAD family (Tier.PALLAS, the asm-tier
analogue of sad_a.asm / libvpx vp9_sad*_sse2).

The grid kernel keeps the whole search window of each CTU resident in VMEM
and streams candidates through the VPU, the TPU equivalent of the asm's
keep-4-accumulators-in-ymm-registers strategy (sad_a.asm:76-152) — except
the batch axis is the CTU grid and the candidate count is unbounded.

On non-TPU backends the kernels run in interpreter mode so the tier stays
testable on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import registry
from ..config import Tier

__all__ = ["sad_grid", "sad", "sad_multiref"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sad_grid_kernel(src_ref, win_ref, out_ref, *, b, num_dy, num_dx):
    # Mosaic requires dynamic offsets in the sublane (second-to-last) dim to
    # be provably 8-aligned, so dy is processed in groups of 8: one aligned
    # dynamic band load of b+8 rows, then 8 static sub-offsets within it.
    s = src_ref[0].astype(jnp.int32)  # (b, b)
    n_groups = (num_dy + 7) // 8

    def group_body(k, _):
        base = pl.multiple_of(8 * k, 8)
        band8 = win_ref[0, pl.ds(base, b + 8), :].astype(jnp.int32)  # (b+8, Wx)
        rows = []
        for r in range(8):  # static unroll: dy = 8k + r
            band = band8[r : r + b]
            rows.append(
                jnp.stack(
                    [jnp.sum(jnp.abs(s - band[:, dx : dx + b])) for dx in range(num_dx)]
                )
            )
        out_ref[0, pl.ds(base, 8), :] = jnp.stack(rows)  # (8, num_dx)
        return 0

    jax.lax.fori_loop(0, n_groups, group_body, 0)


@functools.partial(jax.jit, static_argnames=("num_dy", "num_dx"))
def sad_grid(src: jnp.ndarray, window: jnp.ndarray, num_dy: int, num_dx: int) -> jnp.ndarray:
    """Pallas full-search SAD grid; same contract as ops.sad.sad_grid.

    src (n, b, b) uint8, window (n, >=b+num_dy-1, >=b+num_dx-1) uint8
    -> (n, num_dy, num_dx) int32, bit-exact.  2-D (unbatched) inputs are
    accepted like ops.sad.sad_grid and return (num_dy, num_dx).
    """
    squeeze = src.ndim == 2
    if squeeze:
        src, window = src[None], window[None]
    n, b, _ = src.shape
    wh, ww = b + num_dy - 1, b + num_dx - 1
    window = window[:, :wh, :ww]
    # Pad rows so every aligned 8-group band load (b+8 rows at offset 8k) and
    # the 8-row output stores stay in bounds; the wrapper strips the excess.
    n_groups = (num_dy + 7) // 8
    wh_pad = 8 * (n_groups - 1) + b + 8
    if wh_pad > wh:
        window = jnp.pad(window, ((0, 0), (0, wh_pad - wh), (0, 0)))
    dy_pad = 8 * n_groups
    kernel = functools.partial(_sad_grid_kernel, b=b, num_dy=num_dy, num_dx=num_dx)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wh_pad, ww), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dy_pad, num_dx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, dy_pad, num_dx), jnp.int32),
        interpret=_interpret(),
    )(src, window)[:, :num_dy]
    return out[0] if squeeze else out


def _sad_kernel(src_ref, ref_ref, out_ref):
    d = src_ref[0].astype(jnp.int32) - ref_ref[0].astype(jnp.int32)
    out_ref[...] = jnp.sum(jnp.abs(d)).reshape(1, 1, 1)


@jax.jit
def sad(src: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Pallas batched single-ref SAD: (n, h, w) x2 -> (n,) int32."""
    squeeze = src.ndim == 2
    if squeeze:
        src, ref = src[None], ref[None]
    n, h, w = src.shape
    out = pl.pallas_call(
        _sad_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
        interpret=_interpret(),
    )(src, ref)[:, 0, 0]
    return out[0] if squeeze else out


def _sad_multiref_kernel(src_ref, refs_ref, out_ref, *, ways):
    s = src_ref[0].astype(jnp.int32)
    # Static unroll over ways; one vector store (scalar VMEM stores are not
    # lowerable on TPU).
    vals = [
        jnp.sum(jnp.abs(s - refs_ref[0, k].astype(jnp.int32)))
        for k in range(ways)
    ]
    out_ref[...] = jnp.stack(vals).reshape(1, 1, ways)


@jax.jit
def sad_multiref(src: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    """Pallas multi-reference SAD: src (..., h, w), refs (..., k, h, w)."""
    squeeze = src.ndim == 2
    if squeeze:
        src, refs = src[None], refs[None]
    n, h, w = src.shape
    k = refs.shape[1]
    kernel = functools.partial(_sad_multiref_kernel, ways=k)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, k), jnp.int32),
        interpret=_interpret(),
    )(src, refs)[:, 0]
    return out[0] if squeeze else out


# The Pallas tier is selectable only where it compiles natively; on CPU the
# interpreter would be orders of magnitude slower than the REF tier, which
# would invert the registry's best-tier-wins priority.  (Tests exercise the
# kernels explicitly in interpreter mode on tiny shapes.)  The predicate is
# evaluated lazily at get() time so importing this module never initializes
# a jax backend (the CLI must be able to choose --platform first).
def _native() -> bool:
    return not _interpret()


registry.register("sad_grid", Tier.PALLAS, sad_grid, available=_native)
registry.register("sad", Tier.PALLAS, sad, available=_native)
registry.register("sad_multiref", Tier.PALLAS, sad_multiref, available=_native)
