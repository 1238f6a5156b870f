"""Quantization family (reference: /root/reference/src/lib/quantize.c).

Three ops, all elementwise and batched here:

* quantize          - HM-style forward quantization with sign/abs split and
                      coded-block-flag reduction (quantize.c:160-186).
* quantize_inverse  - inverse quantization ("scaling", quantize.c:53-62).
* reconstruct       - rec = Clip3(0, 255, pred + res) (quantize.c:292-302).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["quantize", "quantize_inverse", "reconstruct"]


def quantize(src: jnp.ndarray, scale, shift, offset) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward quantization over the trailing two axes.

    src: (..., n, n) int16 transform coefficients.
    scale < 0x8000, 16 <= shift <= 27, offset < 0x8000 (asserted by the
    reference, quantize.c:162-165).  scale/shift/offset may be python ints or
    broadcastable arrays (per-block rate control).

    Returns (dst, cbf): dst int16 quantized levels, bit-exact with
    hevcasm_quantize_c_ref (quantize.c:160-186); cbf bool per block, true iff
    any level is non-zero (the C code ORs the levels and callers test !!cbf,
    quantize.c:181 / :257).
    """
    x = src.astype(jnp.int32)
    scale = jnp.asarray(scale, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    offset = jnp.asarray(offset, jnp.int32) << (shift - 16)
    sign = jnp.where(x < 0, -1, 1)
    q = ((jnp.abs(x) * scale + offset) >> shift) * sign
    q = jnp.clip(q, -32768, 32767)
    cbf = jnp.any(q != 0, axis=(-2, -1))
    return q.astype(jnp.int16), cbf


def quantize_inverse(src: jnp.ndarray, scale, shift) -> jnp.ndarray:
    """Inverse quantization over any shape.

    dst = Clip3(-32768, 32767, (src*scale + (1 << (shift-1))) >> shift),
    bit-exact with hevcasm_quantize_inverse_c_ref (quantize.c:53-62).
    """
    x = src.astype(jnp.int32)
    scale = jnp.asarray(scale, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    y = (x * scale + (1 << (shift - 1))) >> shift
    return jnp.clip(y, -32768, 32767).astype(jnp.int16)


def reconstruct(pred: jnp.ndarray, res: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """rec = Clip3(0, (1<<bit_depth)-1, pred + res), bit-exact with
    hevcasm_quantize_reconstruct_c_ref (quantize.c:292-302)."""
    rec = pred.astype(jnp.int32) + res.astype(jnp.int32)
    return jnp.clip(rec, 0, (1 << bit_depth) - 1).astype(jnp.uint8)
