"""Pallas full-search SSD-grid kernel: rolled-source formulation.

An earlier revision sliced the *window* per dx (128-row unaligned lane
slices + K-augmented matmuls + a scratch round trip); on hardware that VPU
overhead dominated and it lost to the XLA scan.  This design reduces the
whole CTU to ONE full-tile MXU matmul plus a small number of vectorized
VPU passes:

  1. Rolled-source stack: A[dx, y, x'] = sc[y, x'-dx], built by log2(num_dx)
     doubling steps (roll the whole accumulated stack by 2^k and append) —
     NOT num_dx serial one-lane rolls, whose dependency chain dominates the
     kernel.  Rolls are int32 (Mosaic's dynamic_rotate requires 32-bit data).
  2. One matmul  G = A.reshape(num_dx*b, ww) @ wc^T  -> (num_dx*b, wh).
     Operands are int8 (centered pixels fit [-128,127]): the MXU's native
     s8 x s8 -> s32 path, exact by construction, 2x the bf16 rate, and half
     the operand traffic.  (mm="bf16" keeps the bf16/f32 path, whose K<=128
     accumulations of 15-bit products are also exact — no hi/lo split.)
  3. Diagonal band corr[dx, dy] = sum_y G[dx, y, y+dy] via a halving
     shift-reduce tree: log2(b) levels of  lower_half + roll(upper_half),
     each level halving the data — ~4 MB of VMEM traffic per CTU instead of
     the ~25 MB of the masked-roll formulation (band="rolls").
  4. Window-energy sliding sums from two integer shift-add prefix sums,
     once per CTU on the VPU (v1 folded these into the matmul via
     K-augmentation, 3x the FLOPs).

SSD(dy,dx) = sum(sc^2) + slide_{b x b}(wc^2)(dy,dx) - 2*corr(dy,dx), with
sc = src-128, wc = win-128 (center-invariant).  Output is bit-exact integer
SSD, equal to ops/xla_opt ssd_grid and the jnp REF (tests/test_pallas.py).
Measured (v5e, 510 CTUs, +-32, dispatch-floor-corrected): 1.33 ms/frame vs
3.43 ms for the XLA-scan formulation; the v1 window-sliced kernel measured
~6 ms.  The energy cumsums cost ~0.18 ms, the stack build ~0.56 ms and the
band tree ~0.60 ms of that; the int8 matmul itself pipelines to ~0.

Reference analogue: the 4-accumulator psadbw hot loop sad_a.asm:56-194 —
here the accumulators are the MXU itself and the whole (2R+1)^2 grid of one
CTU is produced per VMEM residency.
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

__all__ = ["ssd_grid"]


def _cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive prefix sum via log2(n) shift-adds (Mosaic has no cumsum)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    shift = 1
    while shift < n:
        shifted = pltpu.roll(x, shift, axis=axis)
        x = x + jnp.where(idx >= shift, shifted, 0)
        shift *= 2
    return x


def _slide(cs: jnp.ndarray, b: int, axis: int) -> jnp.ndarray:
    """Sliding-b window sums from an inclusive prefix sum along `axis`:
    out[i] = cs[i+b-1] - cs[i-1] (cs[-1] := 0), valid for i <= n-b.
    Full-width masked rolls only — Mosaic rejects pads/concats of
    unaligned lane slices.
    """
    n = cs.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, cs.shape, axis)
    hi = pltpu.roll(cs, (n - (b - 1)) % n, axis=axis)   # hi[i] = cs[i+b-1]
    lo = pltpu.roll(cs, 1, axis=axis)                    # lo[i] = cs[i-1]
    return hi - jnp.where(idx >= 1, lo, 0)


def _build_stack_serial(a32: jnp.ndarray, num_dx: int) -> jnp.ndarray:
    """(b, ww) -> (num_dx*b, ww): slab dx = input rolled right by dx."""
    parts = []
    for dx in range(num_dx):
        parts.append(a32)
        if dx + 1 < num_dx:
            a32 = pltpu.roll(a32, 1, axis=1)
    return jnp.concatenate(parts, axis=0)


def _build_stack_double(a32: jnp.ndarray, num_dx: int) -> jnp.ndarray:
    """Same stack via log2(num_dx) doubling steps: roll the whole
    accumulated stack (shifts 0..m-1) right by m to get shifts m..2m-1."""
    b = a32.shape[0]
    stk = a32
    m = 1
    while m < num_dx:
        take = min(m, num_dx - m)
        ext = pltpu.roll(stk[: take * b], m, axis=1)
        stk = jnp.concatenate([stk, ext], axis=0)
        m += take
    return stk


def _build_stack_packed(a8: jnp.ndarray, num_dx: int) -> jnp.ndarray:
    """Doubling build in the int8 domain: bitcast packs 4 consecutive
    sublanes (source rows) into one int32 lane-row, a lane roll shifts all
    four rows together, and the final bitcast unpacks back — quartering the
    data moved by the rolls/concats.  a8 (b, LW) int8, b % 4 == 0."""
    b = a8.shape[0]
    rows = b // 4
    stk = pltpu.bitcast(a8, jnp.int32)               # (b/4, LW)
    m = 1
    while m < num_dx:
        take = min(m, num_dx - m)
        ext = pltpu.roll(stk[: take * rows], m, axis=1)
        stk = jnp.concatenate([stk, ext], axis=0)
        m += take
    return pltpu.bitcast(stk, jnp.int8)              # (num_dx*b, LW)


def _band_rolls(g: jnp.ndarray, b: int, num_dx: int, num_dy: int, wh: int) -> jnp.ndarray:
    """corr[dx, dy] = sum_y g[dx*b+y, y+dy] by rolling row y left by y
    (log2(b) masked power-of-two rolls), then a sublane reduction."""
    yrow = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, g.shape, 0), jnp.int32(b)
    )
    shift = 1
    while shift < b:
        rolled = pltpu.roll(g, (wh - shift) % wh, axis=1)
        g = jnp.where((yrow & shift) != 0, rolled, g)
        shift *= 2
    return jnp.sum(g.reshape(num_dx, b, wh), axis=1)[:, :num_dy]


def _band_tree(g: jnp.ndarray, b: int, num_dx: int, num_dy: int, wh: int) -> jnp.ndarray:
    """Same band via a halving shift-reduce tree: R[dy] = sum_y G[y, y+dy]
    = sum_{y<h} (G[y] + roll_left_h(G[y+h]))[y+dy] with h = b/2, recursed.
    Each level halves the live data; the needed column range (<= 64 + rows)
    always stays clear of the roll's wrap-around garbage."""
    g3 = g.reshape(num_dx, b, wh)
    rows = b
    while rows > 1:
        half = rows // 2
        lower = g3[:, :half, :]
        upper = pltpu.roll(g3[:, half:, :], (wh - half) % wh, axis=2)
        g3 = lower + upper
        rows = half
    return g3[:, 0, :num_dy]


_LW = 128  # fixed lane width: rolls/concats of lane-padded (<128) layouts
           # are rejected by Mosaic, and zero padding contributes zeros to
           # every contraction and sliding sum below.


def _build_stack_chunked(srcw8: jnp.ndarray, num_dx: int) -> jnp.ndarray:
    """Packed doubling build on the chunk-wide (h, Q*LW) int8 layout.

    Rolling the whole Q*LW-lane row by dx rolls every chunk's 128-lane
    block by dx simultaneously; content never crosses a block boundary
    because each block's occupied columns are < LW - dx (b - 1 + dx <=
    ww - 1 <= 127).  h % 4 == 0 packs 4 sublanes per int32 as in
    _build_stack_packed."""
    h = srcw8.shape[0]
    rows = h // 4
    stk = pltpu.bitcast(srcw8, jnp.int32)            # (h/4, Q*LW)
    m = 1
    while m < num_dx:
        take = min(m, num_dx - m)
        ext = pltpu.roll(stk[: take * rows], m, axis=1)
        stk = jnp.concatenate([stk, ext], axis=0)
        m += take
    return pltpu.bitcast(stk, jnp.int8)              # (num_dx*h, Q*LW)


_DN1 = (((1,), (1,)), ((), ()))  # contract dim 1 of both operands


def _band_ones(b: int) -> np.ndarray:
    """(LW, LW) int8 constant: row d is the indicator of [d, d+b)."""
    m = np.zeros((_LW, _LW), np.int8)
    for d in range(_LW - b + 1):
        m[d, d : d + b] = 1
    return m


def _energy_mxu(wi, band, b):
    """Sliding (b, b) box sums of wc^2 on the MXU, oriented [dx, dy].

    E = Band . w2 . Band^T as five exact int8 matmuls: pass 1 on the
    hi/centered-lo byte split of w2 (<= 16384), pass 2 on the 7-bit
    3-way split of the row sums (< 2^21).  Both passes contract dim 1 x
    dim 1, so no transposes are materialized.  Replaces the two VPU
    cumsum+slide passes of _kernel, whose lane-shift chains dominated the
    chunked kernel's VPU time."""
    w2 = wi * wi                                     # (r, x) <= 16384
    hi8 = (w2 >> 8).astype(jnp.int8)
    lo8 = (jnp.bitwise_and(w2, 255) - 128).astype(jnp.int8)
    p_hi = jax.lax.dot_general(band, hi8, _DN1, preferred_element_type=jnp.int32)
    p_lo = jax.lax.dot_general(band, lo8, _DN1, preferred_element_type=jnp.int32)
    # s[dx, r] = sum_{x in [dx, dx+b)} w2[r, x]; the -128 centering adds a
    # constant 128*b per element (every band row has exactly b ones).
    s = 256 * p_hi + p_lo + 128 * b
    a8 = (s >> 14).astype(jnp.int8)
    b8 = jnp.bitwise_and(s >> 7, 127).astype(jnp.int8)
    c8 = jnp.bitwise_and(s, 127).astype(jnp.int8)
    e_a = jax.lax.dot_general(a8, band, _DN1, preferred_element_type=jnp.int32)
    e_b = jax.lax.dot_general(b8, band, _DN1, preferred_element_type=jnp.int32)
    e_c = jax.lax.dot_general(c8, band, _DN1, preferred_element_type=jnp.int32)
    return (e_a << 14) + (e_b << 7) + e_c            # [dx, dy]


def _chunked_body(si_u8, wi_u8, band, *, b, num_dy, num_dx, wh, ww, chunks):
    """Chunked-K SSD grid for ONE CTU (see _kernel_chunked)."""
    Q = chunks
    h = b // Q
    si = si_u8.astype(jnp.int32) - 128
    wi = wi_u8.astype(jnp.int32) - 128
    wi = jnp.pad(wi, ((0, _LW - wh), (0, _LW - ww)))

    srcsq = jnp.sum(si * si)
    eyt = _energy_mxu(wi, band, b)                   # [dx, dy]

    # Chunk-wide source layout (h, Q*LW), then the packed rolled stack.
    # The lane-concat happens in the int32 domain: int8 slices at non-32-
    # multiple sublane offsets have mismatched tile offsets that Mosaic's
    # concat lowering rejects; int32 tiles are 8 sublanes, and the wrapper
    # guarantees h % 8 == 0.  Values are centered so the narrowing is exact.
    sip = jnp.pad(si, ((0, 0), (0, _LW - b)))        # (b, LW) int32
    srcw8 = jnp.concatenate(
        [sip[q * h : (q + 1) * h] for q in range(Q)], axis=1
    ).astype(jnp.int8)                               # (h, Q*LW)
    stk = _build_stack_chunked(srcw8, num_dx)        # (num_dx*h, Q*LW)

    # RHS: lane-concat of the window rolled up by q*h sublanes (rolled in
    # the int32 domain, then narrowed — values are centered into [-128,127]
    # so the astype is exact; Mosaic rejects int8 rolls).
    rhs = jnp.concatenate(
        [(wi if q == 0 else pltpu.roll(wi, (_LW - q * h) % _LW, axis=0)
          ).astype(jnp.int8)
         for q in range(Q)],
        axis=1,
    )                                                # (LW, Q*LW)

    g = jax.lax.dot_general(
        stk, rhs, _DN1, preferred_element_type=jnp.int32,
    )                                                # (num_dx*h, LW)

    corr = _band_tree(g, h, num_dx, num_dy, _LW)     # (num_dx, num_dy)
    return srcsq + eyt[:num_dx, :num_dy] - 2 * corr


def _kernel_chunked(src_ref, win_ref, band_ref, out_ref, *, b, num_dy,
                    num_dx, wh, ww, chunks, group):
    """Chunked-K formulation: Q source-row chunks ride the matmul's
    contraction dimension, so the diagonal-band reduction runs on a
    Q-times-smaller product matrix.

      g[dx*h + y, yy] = sum_q sum_x src[q*h + y, x] * wc[yy + q*h, x]
      corr[dx, dy]    = sum_{y<h} g[dx*h + y, y + dy]        (h = b / Q)

    LHS row (dx, y) concatenates the Q chunk rows of the rolled source
    along lanes; RHS lane-chunk q is the centered window rolled UP by q*h
    sublanes.  The roll wrap of chunk q starts at row LW - q*h >= LW -
    (Q-1)*h = LW - b + h, and the band only ever reads yy <= h - 1 +
    num_dy - 1 < LW - b + h (since wh <= LW), so wrap garbage is never
    read — for every legal geometry.  Window energy rides the MXU too
    (_energy_mxu).  `group` CTUs per grid step amortize per-step overhead
    and let the scheduler overlap one CTU's VPU stack build with another's
    matmuls.  Bit-exact with the unchunked path (tests/test_search_pallas).
    """
    for gi in range(group):
        out_ref[gi] = _chunked_body(
            src_ref[gi], win_ref[gi], band_ref[...],
            b=b, num_dy=num_dy, num_dx=num_dx, wh=wh, ww=ww, chunks=chunks,
        )


def _kernel(src_ref, win_ref, out_ref, *, b, num_dy, num_dx, wh, ww,
            stack, band, mm):
    si = src_ref[0].astype(jnp.int32) - 128          # (b, b)
    wi = win_ref[0].astype(jnp.int32) - 128          # (wh, ww)
    # Zero-pad the window to the fixed (LW, LW) slab (beyond-edge rows and
    # columns contribute zero products / zero energy and are never read).
    wi = jnp.pad(wi, ((0, _LW - wh), (0, _LW - ww)))

    srcsq = jnp.sum(si * si)

    # --- window energy: sliding (b, b) sums of wc^2, via two cumsums -------
    # Computed transposed (x-major) so the result lands in the kernel's
    # [dx, dy] output orientation with no final transpose of a sliced value.
    w2t = (wi * wi).T                                # (LW, LW)
    sl0 = _slide(_cumsum(w2t, axis=0), b, axis=0)    # rows dx valid < num_dx
    eyt = _slide(_cumsum(sl0, axis=1), b, axis=1)    # (LW, LW); [dx, dy] valid

    # --- rolled source stack -----------------------------------------------
    if stack == "packed":
        # int8-domain build: centered source via the XOR-128 reinterpret
        # ((x ^ 0x80) as int8 == x - 128), packed 4-rows-per-int32 rolls.
        assert mm == "int8" and b % 4 == 0
        si8 = pltpu.bitcast(src_ref[0] ^ jnp.uint8(128), jnp.int8)
        a8 = jnp.pad(si8, ((0, 0), (0, _LW - b)))
        amat8 = _build_stack_packed(a8, num_dx)      # (num_dx*b, LW) int8
    else:
        a32 = jnp.pad(si, ((0, 0), (0, _LW - b)))    # (b, LW)
        build = _build_stack_double if stack == "double" else _build_stack_serial
        amat = build(a32, num_dx)                    # (num_dx*b, LW)
        amat8 = None

    # --- one matmul over the whole stack -----------------------------------
    if mm == "int8":
        lhs = amat8 if amat8 is not None else amat.astype(jnp.int8)
        g = jax.lax.dot_general(
            lhs, wi.astype(jnp.int8),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                            # (num_dx*b, wh) exact
    else:
        g = jax.lax.dot_general(
            amat.astype(jnp.bfloat16), wi.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    # --- diagonal band reduction ------------------------------------------
    band_fn = _band_tree if band == "tree" else _band_rolls
    corr = band_fn(g, b, num_dx, num_dy, _LW)        # (num_dx, num_dy)

    out_ref[0] = srcsq + eyt[:num_dx, :num_dy] - 2 * corr


@functools.partial(
    jax.jit, static_argnames=("num_dy", "num_dx", "stack", "band", "mm",
                              "chunks", "group")
)
def ssd_grid(src: jnp.ndarray, window: jnp.ndarray, num_dy: int, num_dx: int,
             stack: str = "packed", band: str = "tree",
             mm: str = "int8", chunks: int = 8,
             group: int | None = None) -> jnp.ndarray:
    """Pallas rolled-source full-search SSD grid.

    src (n, b, b) uint8, window (n, >=b+num_dy-1, >=b+num_dx-1) uint8
    -> (n, num_dy, num_dx) int32, bit-exact integer SSD (same contract as
    kernels/xla_opt.ssd_grid).  2-D inputs accepted, returning 2-D.

    chunks > 1 selects the chunked-K formulation (_kernel_chunked): Q
    source-row chunks fold into the contraction dimension, shrinking the
    band-reduction input Q-fold, with MXU window energy (_energy_mxu) and
    `group` CTUs per grid step; falls back to the unchunked r2 path when
    the geometry doesn't divide (needs b % chunks == 0, (b/chunks) % 8 ==
    0, int8).  Measured on v5e at 510 CTUs +-32: 0.45 ms/frame (chunks=8,
    group=2) vs 1.00 ms unchunked and 3.4 ms for the XLA scan.
    """
    squeeze = src.ndim == 2
    if squeeze:
        src, window = src[None], window[None]
    n, b, _ = src.shape
    assert b & (b - 1) == 0, "block size must be a power of two"
    if stack == "packed" and (mm != "int8" or b % 4):
        stack = "double"  # packed build requires the s8 path and b % 4 == 0
    wh, ww = b + num_dy - 1, b + num_dx - 1
    assert wh <= _LW and ww <= _LW, "window must fit the fixed 128-lane slab"
    window = window[:, :wh, :ww]
    if chunks > 1 and not (
        mm == "int8" and b % chunks == 0 and (b // chunks) % 8 == 0
    ):
        chunks = 1
    if chunks > 1:
        if group is None:
            # Small blocks are per-step-overhead bound: scale the group so
            # a step touches ~128 source rows (b=64 -> 2, b=16 -> 8).
            group = max(2, 128 // b)
        G = min(group, n)
        steps = -(-n // G)
        pad = steps * G - n
        if pad:
            src = jnp.pad(src, ((0, pad), (0, 0), (0, 0)))
            window = jnp.pad(window, ((0, pad), (0, 0), (0, 0)))
        kernel = functools.partial(
            _kernel_chunked, b=b, num_dy=num_dy, num_dx=num_dx, wh=wh, ww=ww,
            chunks=chunks, group=G,
        )
        out = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((G, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, wh, ww), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_LW, _LW), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (G, num_dx, num_dy), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((steps * G, num_dx, num_dy), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(src, window, jnp.asarray(_band_ones(b)))[:n]
    else:
        kernel = functools.partial(
            _kernel, b=b, num_dy=num_dy, num_dx=num_dx, wh=wh, ww=ww,
            stack=stack, band=band, mm=mm,
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
            interpret=jax.default_backend() != "tpu",
        )(src, window)
    out = jnp.swapaxes(out, 1, 2)  # kernel emits [dx, dy]
    return out[0] if squeeze else out


registry.register(
    "ssd_grid", Tier.PALLAS, ssd_grid,
    available=lambda: jax.default_backend() == "tpu",
)
