"""Sum-of-squared-differences (reference: /root/reference/src/lib/ssd.c and
the linear variant in diff.c).

Used for distortion / PSNR.  ssd.c:43-55 is the rectangular C reference;
diff.c:45-54 is the contiguous 1-D variant.  Here both are batched
reductions; int64 accumulation is used for whole-frame sums (a 4K frame of
squared 8-bit differences can exceed int32).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ssd", "ssd_linear"]


def ssd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SSD over the trailing two axes.  (..., h, w) -> (...,) int32.

    Bit-exact with hevcasm_ssd_c_ref (ssd.c:43-55) per block.
    """
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=(-2, -1))


def ssd_linear(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SSD over the trailing axis of a contiguous buffer.

    (..., n) -> (...,) int32.  Bit-exact with hevcasm_ssd_linear_c_ref
    (diff.c:45-54).
    """
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=-1)
