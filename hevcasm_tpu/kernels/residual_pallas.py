"""Fused Pallas TPU kernel: the whole TU residual pipeline per CTU in one
VMEM residency — residual, 8x8 forward DCT, quantize, dequantize, inverse
DCT, add-to-predicted, clip.

This is the Pallas analogue of the reference's residual path composition
(SURVEY.md section 3.3: transform -> quantize -> quantize_inverse ->
inverse_transform_add), which on x86 is four separate asm calls with HBM
(well, cache) traffic between them; here a CTU makes exactly one trip
HBM -> VMEM -> HBM.

Key formulation: an 8x8 transform applied to each of the 64 TUs of a 64x64
CTU equals a single 64x64 matmul with the block-diagonal constant
BD = kron(I8, T8):  Y = BD @ X @ BD^T applies T8 per 8-row/8-col block.
That turns 128 tiny 8x8 matmuls into two MXU-shaped 64x64 matmuls per pass.
Integer exactness uses the hi/lo byte split (cf. kernels/xla_opt.py): each
output accumulates <= 8 products of 7-bit x 8-bit values, far inside f32's
exact range.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import registry
from ..config import Tier
from ..ops import transform as tr

__all__ = ["residual_pipeline_ctu", "block_diag_t8"]


def block_diag_t8() -> np.ndarray:
    """kron(I8, T8): 64x64 block-diagonal 8-point HEVC matrix."""
    return block_diag_t(8)


def block_diag_t(tu: int, ctu: int = 64, tr_type: int = 0) -> np.ndarray:
    """kron(I_{ctu/tu}, T_tu): (ctu, ctu) block-diagonal HEVC transform —
    one constant per TU size, applying T_tu per tu-row/tu-col block.
    tr_type 1 selects the 4x4 DST-VII (residual_decode.c:914)."""
    t = tr.DST4 if tr_type else tr.dct_matrix(tu)
    return np.kron(np.eye(ctu // tu, dtype=np.int32), t)


def _mm(bd, x):  # bf16 matmul with f32 accumulation, x int32 exact via split
    lo = jnp.bitwise_and(x, 255).astype(jnp.bfloat16)
    hi = (x >> 8).astype(jnp.bfloat16)
    yl = jnp.dot(bd, lo, preferred_element_type=jnp.float32)
    yh = jnp.dot(bd, hi, preferred_element_type=jnp.float32)
    return 256 * yh.astype(jnp.int32) + yl.astype(jnp.int32)


def _mm_t(x, bd):  # x @ bd^T with the same exactness scheme
    lo = jnp.bitwise_and(x, 255).astype(jnp.bfloat16)
    hi = (x >> 8).astype(jnp.bfloat16)
    yl = jnp.dot(lo, bd.T, preferred_element_type=jnp.float32)
    yh = jnp.dot(hi, bd.T, preferred_element_type=jnp.float32)
    return 256 * yh.astype(jnp.int32) + yl.astype(jnp.int32)


def _wrap16(x):
    return x.astype(jnp.int16).astype(jnp.int32)


def _bits_egk(q):
    """Exp-Golomb-style bit cost per quantized level, elementwise int32:
    0 for q == 0 else 2*floor(log2|q|) + 3 — the encode/rate.py
    bits_estimate proxy, computed exactly via the f32 exponent field
    (|q| <= 32767 < 2^24 converts exactly; floor(log2 a) = biased exponent
    - 127)."""
    a = jnp.abs(q)
    fl = (jax.lax.bitcast_convert_type(
        jnp.maximum(a, 1).astype(jnp.float32), jnp.int32) >> 23) - 127
    return jnp.where(a > 0, 2 * fl + 3, 0)


def residual_core(src, pred, bd, pool, *, qscale, qshift, qoffset, dscale,
                  dshift, tu: int = 8):
    """The fused TU pipeline on one CTU, reusable from other Pallas kernels
    (e.g. the fused inter kernel, kernels/interp_pallas.py).

    src/pred (64, 64) int32, bd = block_diag_t(tu), pool the matching
    kron(I, ones(1, tu)) -> (recon (64, 64) int32 in [0, 255],
    nnz (64/tu, 64/tu) int32 per-TU coded-coefficient counts,
    bits (64/tu, 64/tu) int32 per-TU Exp-Golomb bit-cost sums).  Forward
    shifts follow residual_decode.c:855-892 (s1 = log2 - 1, s2 = log2 + 6);
    the hi/lo-split matmuls stay exact for every size (<= 32 products of
    8-bit x T-coefficient magnitudes < 2^24)."""
    log2 = tu.bit_length() - 1
    s1, s2 = log2 - 1, log2 + 6
    res = src - pred

    # Forward DCT per TU, transpose-free composite with the SAME
    # rounding points as the reference's two butterfly passes
    # (residual_decode.c:871-876): pass 1 contracts each TU's column index
    # (res @ BD^T, the row transform), pass 2 its row index (BD @ s1), with
    # int16 wrap between passes.
    s1v = _wrap16((_mm_t(res, bd) + (1 << (s1 - 1))) >> s1)
    coeffs = _wrap16((_mm(bd, s1v) + (1 << (s2 - 1))) >> s2)

    # Quantize (quantize.c:160-186) with static HM-style parameters.
    sign = jnp.where(coeffs < 0, -1, 1)
    q = ((jnp.abs(coeffs) * qscale + (qoffset << (qshift - 16))) >> qshift) * sign
    q = jnp.clip(q, -32768, 32767)
    # Per-TU coded-coefficient counts: (8, 8) TU grid of the CTU, so callers
    # get cbf at the reference's per-TU granularity (quantize.c:181-184).
    # Mosaic has no (64,64)->(8,8,8,8) reshape; the 8x8 box count is the
    # pooling sandwich P @ nz @ P^T with P = kron(I8, ones(1,8)) — counts
    # <= 64 so f32 accumulation is exact.
    nz = (q != 0).astype(jnp.float32)
    cnt = jnp.dot(jnp.dot(pool, nz, preferred_element_type=jnp.float32), pool.T,
                  preferred_element_type=jnp.float32)
    # Per-TU Exp-Golomb bit-cost sums ride the same pooling sandwich
    # (<= 33 bits x 64 coeffs per TU: f32-exact) so rate control can run
    # the fused tier with no separate level readback (VERDICT r3 #3).
    bits = jnp.dot(jnp.dot(pool, _bits_egk(q).astype(jnp.float32),
                           preferred_element_type=jnp.float32), pool.T,
                   preferred_element_type=jnp.float32)

    # Dequantize (quantize.c:53-62).
    dq = jnp.clip((q * dscale + (1 << (dshift - 1))) >> dshift, -32768, 32767)

    # Inverse DCT with clipped passes (residual_decode.c:124-171): the
    # inverse pass is dst = X^T-contraction with T columns, i.e.
    # r1 = clip((BD^T @ dq... expressed as (dq^T @ BD)^T == BD^T @ dq).
    r1 = jnp.clip((_mm(bd.T, dq) + 64) >> 7, -32768, 32767)
    r2 = jnp.clip((_mm_t(r1, bd.T) + 2048) >> 12, -32768, 32767)

    return jnp.clip(pred + r2, 0, 255), cnt.astype(jnp.int32), bits.astype(jnp.int32)


def residual_core_stacked(src, pred, bd, bdg, poolg, pool, *, qscale, qshift,
                          qoffset, dscale, dshift):
    """residual_core over G CTUs stacked along rows, for the group-batched
    fused inter kernel (kernels/interp_pallas.py).

    src/pred (G*64, 64) int32; bd (64, 64) the 8x8 block-diagonal
    transform; bdg = kron(I_G, bd) (G*64, G*64); poolg = kron(I_G, pool)
    (G*8, G*64); pool (8, 64).  Returns (recon (G*64, 64) int32 in
    [0, 255], nnz (G*8, 8) int32).  Bit-exact with G independent
    residual_core calls: the row-transform passes are row-independent, and
    the block-diagonal left passes contract only within each CTU's block
    (the extra K entries are exact zeros).
    """
    res = src - pred
    s1 = _wrap16((_mm_t(res, bd) + 2) >> 2)          # 8x8 shifts (2, 9)
    coeffs = _wrap16((_mm(bdg, s1) + 256) >> 9)

    sign = jnp.where(coeffs < 0, -1, 1)
    q = ((jnp.abs(coeffs) * qscale + (qoffset << (qshift - 16))) >> qshift) * sign
    q = jnp.clip(q, -32768, 32767)
    nz = (q != 0).astype(jnp.float32)
    cnt = jnp.dot(jnp.dot(poolg, nz, preferred_element_type=jnp.float32),
                  pool.T, preferred_element_type=jnp.float32)
    bits = jnp.dot(jnp.dot(poolg, _bits_egk(q).astype(jnp.float32),
                           preferred_element_type=jnp.float32), pool.T,
                   preferred_element_type=jnp.float32)

    dq = jnp.clip((q * dscale + (1 << (dshift - 1))) >> dshift, -32768, 32767)
    r1 = jnp.clip((_mm(bdg.T, dq) + 64) >> 7, -32768, 32767)
    r2 = jnp.clip((_mm_t(r1, bd.T) + 2048) >> 12, -32768, 32767)
    return (jnp.clip(pred + r2, 0, 255), cnt.astype(jnp.int32),
            bits.astype(jnp.int32))


def _kernel(src_ref, pred_ref, bd_ref, pool_ref, qp_ref, out_ref, nnz_ref,
            *, tu):
    rec, cnt, _ = residual_core(
        src_ref[0].astype(jnp.int32), pred_ref[0].astype(jnp.int32),
        bd_ref[...], pool_ref[...],
        qscale=qp_ref[0], qshift=qp_ref[1], qoffset=qp_ref[2],
        dscale=qp_ref[3], dshift=qp_ref[4], tu=tu,
    )
    nnz_ref[0] = cnt
    out_ref[0] = rec.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("tu", "tr_type"))
def residual_pipeline_ctu(
    src_ctus: jnp.ndarray,
    pred_ctus: jnp.ndarray,
    qscale: int,
    qshift: int,
    qoffset: int,
    dscale: int,
    dshift: int,
    tu: int = 8,
    tr_type: int = 0,
):
    """Fused residual pipeline over (n, 64, 64) CTU stacks, any TU size
    4/8/16/32 (the block-diagonal kron(I, T_tu) generalisation; tr_type 1
    selects the 4x4 DST-VII).

    Returns (recon (n, 64, 64) uint8, nnz_tu (n, 64/tu, 64/tu) int32
    per-TU coded-coefficient counts in the CTU's TU-grid order), bit-exact
    with the composed REF ops (tests/test_residual_pallas.py).
    """
    n, b, _ = src_ctus.shape
    k = b // tu
    bd = jnp.asarray(block_diag_t(tu, b, tr_type)).astype(jnp.bfloat16)
    pool = jnp.asarray(np.kron(np.eye(k, dtype=np.float32), np.ones((1, tu), np.float32)))
    qp = jnp.stack([jnp.asarray(v, jnp.int32)
                    for v in (qscale, qshift, qoffset, dscale, dshift)])
    kernel = functools.partial(_kernel, tu=tu)
    rec, nnz = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, b, b), jnp.uint8),
            jax.ShapeDtypeStruct((n, k, k), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(src_ctus, pred_ctus, bd, pool, qp)
    return rec, nnz


def _residual_pipeline_pallas(src, pred, qscale, qshift, qoffset, dscale,
                              dshift, tu=8, tr_type=0):
    """PALLAS tier of ops.residual.residual_pipeline: the fused per-CTU
    block-diagonal kernel, any TU size (tr_type 1 = 4x4 DST for intra
    luma).  CTUs smaller than the TU raise (no such geometry)."""
    if src.shape[-1] % tu or (tr_type and tu != 4):
        raise NotImplementedError("CTU must be a TU multiple (DST is 4x4-only)")
    rec, nnz_tu = residual_pipeline_ctu(
        src, pred, qscale, qshift, qoffset, dscale, dshift, tu=tu,
        tr_type=tr_type)
    return rec, jnp.sum(nnz_tu), (nnz_tu > 0).reshape(-1)


registry.register("residual_pipeline", Tier.PALLAS, _residual_pipeline_pallas)
