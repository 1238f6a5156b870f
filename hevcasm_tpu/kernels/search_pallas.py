"""Pallas TPU full-search kernel: the exact-integer SSD candidate grid of a
whole CTU computed in one VMEM residency, MXU-fed.

This is the TPU answer to the reference's motion-search inner loop
(sad_a.asm:56-194 keeps 4 accumulators in ymm registers and streams rows;
here the whole (2R+1)^2 grid of one CTU is produced by B-row matmuls while
the search window never leaves VMEM).

Formulation (bit-exact integer SSD, derivation):

  SSD(dy,dx) = sum_{y,x} (s[y,x] - w[y+dy, x+dx])^2
             = sum sc^2  +  slide(wc^2)  -  2 corr          (center-invariant,
  with sc = s-128, wc = w-128 so both fit exactly in bf16)

The energy term is folded INTO the correlation matmul by augmenting the
contraction axis (K = 3B instead of B):

  A      = [ 2*sc | -256*ones | -ones ]          (B, 3B)   bf16
  W_dx   = [ wc[:,dx:dx+B] | w2hi | w2lo ]       (WH, 3B)  bf16
  G_dx   = A . W_dx^T                            (B, WH)   f32

where w2 = wc*wc = 256*w2hi + w2lo (8-bit halves, exactly representable in
bf16).  Then G_dx[y, yy] = 2*corr_row - row_energy, every product <= 2^15 and
every K<=192 accumulation <= 2^23: the f32 MXU result is exact and integer.
Converting to int32 and reducing the diagonal band

  out[dx, dy] = srcsq - sum_y G_dx[y, y+dy]      (int32, exact)

yields the SSD grid.  The diagonal reduction is B static slice-adds of the
(num_dx, num_dy) plane from VMEM scratch — pure data movement.

Bit-exact with ops/xla_opt ssd_grid (tests/test_search_pallas.py); ~3x the
minimal FLOPs (K-augmentation + row-pair overcompute) in exchange for zero
HBM intermediates — the XLA-scan formulation (kernels/xla_opt.ssd_grid)
materializes ~4 GB of per-step intermediates per 1080p frame and is
bandwidth-bound ~20x slower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import registry
from ..config import Tier

__all__ = ["ssd_grid"]


_GROUP = 8  # dx values per scratch refill; bounds live VMEM to ~256 KB


def _kernel(src_ref, win_ref, out_ref, g_ref, *, b, num_dy, num_dx, wh):
    si = src_ref[0].astype(jnp.int32) - 128
    wi = win_ref[0].astype(jnp.int32) - 128

    srcsq = jnp.sum(si * si)

    w2 = wi * wi                       # <= 16384
    wc = wi.astype(jnp.bfloat16)
    w2hi = (w2 >> 8).astype(jnp.bfloat16)   # <= 64
    w2lo = (w2 & 255).astype(jnp.bfloat16)  # <= 255

    a = jnp.concatenate(
        [
            (2 * si).astype(jnp.bfloat16),
            jnp.full((b, b), -256.0, jnp.bfloat16),
            jnp.full((b, b), -1.0, jnp.bfloat16),
        ],
        axis=1,
    )  # (b, 3b)

    dn = (((1,), (1,)), ((), ()))  # contract K: A (b, 3b) x W (wh, 3b) -> (b, wh)
    # Static unroll (Mosaic wants static lane slices), in groups so the
    # scratch and the unrolled matmuls' temporaries stay small.
    for k in range(0, num_dx, _GROUP):
        gsz = min(_GROUP, num_dx - k)
        for r in range(gsz):
            dx = k + r
            w_cat = jnp.concatenate(
                [wc[:, dx : dx + b], w2hi[:, dx : dx + b], w2lo[:, dx : dx + b]],
                axis=1,
            )  # (wh, 3b)
            g = jax.lax.dot_general(a, w_cat, dn, preferred_element_type=jnp.float32)
            g_ref[r] = g.astype(jnp.int32)  # exact: |G| < 2^23, integer-valued

        # out[dx, dy] = srcsq - sum_y G[dx, y, y+dy]: diagonal-band adds.
        acc = jnp.zeros((gsz, num_dy), jnp.int32)
        for y in range(b):
            acc = acc + g_ref[:gsz, y, y : y + num_dy]
        out_ref[0, k : k + gsz, :] = srcsq - acc


@functools.partial(jax.jit, static_argnames=("num_dy", "num_dx"))
def ssd_grid(src: jnp.ndarray, window: jnp.ndarray, num_dy: int, num_dx: int) -> jnp.ndarray:
    """Pallas full-search SSD grid; same contract as xla_opt.ssd_grid.

    src (n, b, b) uint8, window (n, >=b+num_dy-1, >=b+num_dx-1) uint8
    -> (n, num_dy, num_dx) int32, bit-exact integer SSD.  2-D (unbatched)
    inputs are accepted and return (num_dy, num_dx).
    """
    squeeze = src.ndim == 2
    if squeeze:
        src, window = src[None], window[None]
    n, b, _ = src.shape
    wh, ww = b + num_dy - 1, b + num_dx - 1
    window = window[:, :wh, :ww]
    kernel = functools.partial(
        _kernel, b=b, num_dy=num_dy, num_dx=num_dx, wh=wh
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wh, ww), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, num_dx, num_dy), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, num_dx, num_dy), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_GROUP, b, wh), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(src, window)
    out = jnp.swapaxes(out, 1, 2)  # kernel produces [dx, dy]
    return out[0] if squeeze else out


registry.register(
    "ssd_grid", Tier.PALLAS, ssd_grid,
    available=lambda: jax.default_backend() == "tpu",
)
