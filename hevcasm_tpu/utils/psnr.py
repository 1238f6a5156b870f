"""PSNR from SSD, the distortion metric of BASELINE.json."""

from __future__ import annotations

import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """PSNR in dB over all elements of a/b (any shape)."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    mse = jnp.mean(d * d)
    peak = float((1 << bit_depth) - 1)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-10))
