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


def _build_stack_scratch(srcw8: jnp.ndarray, num_dx: int, scr, gi) -> jnp.ndarray:
    """The packed doubling build written into a VMEM scratch instead of
    repeated concats: each concat step copies the WHOLE accumulated prefix
    again (total ~2x the final stack), while scratch slice-writes touch
    each output row once plus one prefix read per doubling step — about
    half the VPU traffic of _build_stack_chunked at production num_dx."""
    h = srcw8.shape[0]
    rows = h // 4
    scr[gi, 0:rows] = pltpu.bitcast(srcw8, jnp.int32)
    m = 1
    while m < num_dx:
        take = min(m, num_dx - m)
        scr[gi, m * rows:(m + take) * rows] = pltpu.roll(
            scr[gi, 0:take * rows], m, axis=1
        )
        m += take
    return pltpu.bitcast(scr[gi, 0:num_dx * rows], jnp.int8)


def _chunked_body(si_u8, wi_u8, band, *, b, num_dy, num_dx, wh, ww, chunks,
                  stack_scr=None):
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
    if stack_scr is not None:
        stk = _build_stack_scratch(srcw8, num_dx, *stack_scr)
    else:
        stk = _build_stack_chunked(srcw8, num_dx)    # (num_dx*h, Q*LW)

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
                              "chunks", "group", "prep")
)
def ssd_grid(src: jnp.ndarray, window: jnp.ndarray, num_dy: int, num_dx: int,
             stack: str = "packed", band: str = "tree",
             mm: str = "int8", chunks: int = 8,
             group: int | None = None, prep: str = "xla") -> jnp.ndarray:
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
    if window.shape[2] > ww:
        # Lane-aligned slabs wider than the logical window are accepted
        # as-is (up to the 128-lane slab): every energy/correlation read
        # stays below column b + num_dx - 1, so the extra columns are
        # inert whatever they contain — callers can then feed full-tile
        # aligned gathers instead of masked partial-lane DMAs.
        ww = min(window.shape[2], _LW)
    window = window[:, :wh, :ww]
    if chunks > 1 and not (
        mm == "int8" and b % chunks == 0 and (b // chunks) % 8 == 0
    ):
        chunks = 1
    if chunks > 1 and (stack, band) != ("packed", "tree"):
        # The chunked formulations hardwire their build/reduction; honoring
        # an explicit variant request requires the unchunked kernel
        # (fail-loudly, ADVICE r4).
        raise ValueError(
            f"stack={stack!r}/band={band!r} variants apply to the unchunked "
            "kernel only — pass chunks=1 to select them"
        )
    if chunks > 1 and prep == "xla":
        # Layout-in-XLA path: the kernel computes only the correlation band
        # (_kernel_corr); source/window layout, srcsq, window energy, and
        # the final combine are XLA ops fused around the kernel.
        if group is None:
            group = max(2, 128 // b)
        G = min(group, n)
        steps = -(-n // G)
        pad = steps * G - n
        if pad:
            src = jnp.pad(src, ((0, pad), (0, 0), (0, 0)))
            window = jnp.pad(window, ((0, pad), (0, 0), (0, 0)))
        h = b // chunks
        si = src.astype(jnp.int32) - 128
        srcsq = jnp.sum(si * si, axis=(1, 2)).reshape(-1, 1, 1)
        srcc = _prep_src_chunked(src, b, h, chunks)
        win8 = _prep_win_i8(window, wh, ww)
        kernel = functools.partial(
            _kernel_corr, b=b, h=h, num_dx=num_dx, num_dy=num_dy,
            chunks=chunks, group=G,
        )
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
            out_specs=pl.BlockSpec((G, num_dx, num_dy), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((steps * G, num_dx, num_dy),
                                           jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(srcc, win8, srcsq, jnp.asarray(_band_ones(b)))[:n]
        out = jnp.swapaxes(out, 1, 2)                    # (n, num_dy, num_dx)
        return out[0] if squeeze else out
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


def _kernel_slab(srcc_ref, top_ref, bot_ref, band_ref, out_ref, scr_a, scr_b,
                 *, b, h, num, chunks, group, cgroups, wp):
    """Chunked-K SSD grids fed straight from the reference PLANE.

    The r4 path materialized a (n, 128, 128) window stack in XLA (stitch
    reshapes + centered-int8 conversion — ~0.15 ms/frame of HBM layout
    traffic at 1080p).  Here the grid walks (ctu_row, col_group) and the
    plane arrives as two 64-row blocks per step (Pallas re-fetches them
    only when the row changes); the first col-group of each row builds two
    packed centered slab variants in VMEM scratch — the raw rows and the
    same rolled left by 64 lanes — and every CTU's (128, 128) window is
    then ONE dynamic 128-aligned lane slice of the variant matching its
    column parity.  Window energy, srcsq, the rolled-stack matmul, and the
    band tree are unchanged from _kernel_corr.  Covers the headline
    geometry (b = 64, search range 32); bit-exact with ssd_grid
    (tests/test_search_pallas.py).

    Reference analogue: the asm search loop reads ref pixels directly at
    candidate addresses (sad_a.asm:76-152) — no intermediate window
    buffer exists there either.
    """
    j = pl.program_id(1)
    Q = chunks
    rows4 = _LW // 4
    G = group

    @pl.when(j == 0)
    def _():
        top = pltpu.bitcast(top_ref[...], jnp.int32)      # (16, wp)
        bot = pltpu.bitcast(bot_ref[...], jnp.int32)
        ap = jnp.concatenate([top, bot], axis=0) ^ jnp.int32(
            np.int32(np.uint32(0x80808080)))
        # ^ 0x80808080: per-byte centering (x - 128 as int8) in the packed
        # domain (int8 vector arithmetic does not exist on the VPU).
        scr_a[...] = ap
        scr_b[...] = pltpu.roll(ap, wp - 64, axis=1)

    for g in range(G):
        half = j * (G // 2) + g // 2
        src_v = (scr_a if g % 2 == 0 else scr_b)[:, pl.ds(half * _LW, _LW)]
        w8 = pltpu.bitcast(src_v, jnp.int8)               # (128, 128) centered
        wi = w8.astype(jnp.int32)
        eyt = _energy_mxu(wi, band_ref[...], b)           # [dx, dy]
        srcc = srcc_ref[g]                                # (h, Q*LW) int8
        s32 = srcc.astype(jnp.int32)
        srcsq = jnp.sum(s32 * s32)
        stk = _build_stack_chunked(srcc, num)             # (num*h, Q*LW)
        rhs = pltpu.bitcast(
            jnp.concatenate(
                [src_v if q == 0 else
                 pltpu.roll(src_v, (rows4 - q * h // 4) % rows4, axis=0)
                 for q in range(Q)],
                axis=1,
            ),
            jnp.int8,
        )                                                 # (LW, Q*LW)
        gm = jax.lax.dot_general(stk, rhs, _DN1, preferred_element_type=jnp.int32)
        corr = _band_tree(gm, h, num, num, _LW)
        out_ref[g] = srcsq + eyt[:num, :num] - 2 * corr


def _kernel_slab_multi(srcc_ref, *refs, b, h, num, chunks, group, cgroups,
                       wp, k):
    """k-reference slab search: the rolled-source stack is built ONCE per
    CTU and scored against every reference plane's window — the k-way
    generalisation the reference ships as 4-way multiref SAD (one src row
    vs 4 refs per pass, sad_a.asm:56-194).  full_search_multi's r4 path
    re-tiled the source k-fold and rebuilt the stack per plane
    (VERDICT r4 weak #3).

    refs = k*(top, bot) plane-row blocks, band, out_ref, then 2k slab
    scratch variants (per plane: packed centered rows + the 64-lane-rolled
    copy), laid out exactly as _kernel_slab's."""
    plane_rows = refs[: 2 * k]
    band_ref = refs[2 * k]
    out_ref = refs[2 * k + 1]
    scrs = refs[2 * k + 2 :]
    j = pl.program_id(1)
    Q = chunks
    rows4 = _LW // 4
    G = group

    @pl.when(j == 0)
    def _():
        for p in range(k):
            top = pltpu.bitcast(plane_rows[2 * p][...], jnp.int32)
            bot = pltpu.bitcast(plane_rows[2 * p + 1][...], jnp.int32)
            ap = jnp.concatenate([top, bot], axis=0) ^ jnp.int32(
                np.int32(np.uint32(0x80808080)))
            scrs[2 * p][...] = ap
            scrs[2 * p + 1][...] = pltpu.roll(ap, wp - 64, axis=1)

    for g in range(G):
        half = j * (G // 2) + g // 2
        srcc = srcc_ref[g]
        s32 = srcc.astype(jnp.int32)
        srcsq = jnp.sum(s32 * s32)
        stk = _build_stack_chunked(srcc, num)             # built ONCE
        for p in range(k):
            src_v = scrs[2 * p + (g % 2)][:, pl.ds(half * _LW, _LW)]
            w8 = pltpu.bitcast(src_v, jnp.int8)
            wi = w8.astype(jnp.int32)
            eyt = _energy_mxu(wi, band_ref[...], b)
            rhs = pltpu.bitcast(
                jnp.concatenate(
                    [src_v if q == 0 else
                     pltpu.roll(src_v, (rows4 - q * h // 4) % rows4, axis=0)
                     for q in range(Q)],
                    axis=1,
                ),
                jnp.int8,
            )
            gm = jax.lax.dot_general(stk, rhs, _DN1,
                                     preferred_element_type=jnp.int32)
            corr = _band_tree(gm, h, num, num, _LW)
            out_ref[g, p] = srcsq + eyt[:num, :num] - 2 * corr


@functools.partial(jax.jit, static_argnames=("grid", "num", "chunks", "group"))
def ssd_grid_plane_multi(src_ctus: jnp.ndarray, planes: jnp.ndarray,
                         grid: tuple[int, int], num: int, chunks: int = 8,
                         group: int = 2) -> jnp.ndarray:
    """k-reference slab full search: (gr*gc, 64, 64) src + (k, Hp, Wp)
    planes -> (n, k, num, num) int32 exact SSD grids ([dy, dx]), bit-exact
    with per-plane ssd_grid_plane calls; the rolled-source stack is shared
    across the k planes in-kernel.  Geometry as ssd_grid_plane."""
    n, b, _ = src_ctus.shape
    k = planes.shape[0]
    gr, gc = grid
    assert b == 64 and num == _LW - b + 1 and n == gr * gc
    assert gc % 2 == 0, "slab path needs an even CTU-grid width"
    h = b // chunks
    hp_need = gr * 64 + 64
    wp_need = gc * 64 + 64
    hp, wp0 = planes.shape[1], planes.shape[2]
    assert hp >= hp_need and wp0 >= wp_need
    wp = -(-wp_need // _LW) * _LW
    if wp0 < wp:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, wp - wp0)))
    elif wp0 > wp:
        planes = planes[:, :, :wp]
    if hp > hp_need:
        planes = planes[:, :hp_need]

    G = group if gc % group == 0 and group % 2 == 0 else 2
    cgroups = gc // G
    srcc = _prep_src_chunked(src_ctus, b, h, chunks)

    kernel = functools.partial(
        _kernel_slab_multi, b=b, h=h, num=num, chunks=chunks, group=G,
        cgroups=cgroups, wp=wp, k=k,
    )
    plane_specs = []
    plane_args = []
    for p in range(k):
        plane_specs.append(pl.BlockSpec((64, wp), lambda i, j: (i, 0),
                                        memory_space=pltpu.VMEM))
        plane_specs.append(pl.BlockSpec((64, wp), lambda i, j: (i + 1, 0),
                                        memory_space=pltpu.VMEM))
        plane_args += [planes[p], planes[p]]
    out = pl.pallas_call(
        kernel,
        grid=(gr, cgroups),
        in_specs=[
            pl.BlockSpec((G, h, chunks * _LW),
                         lambda i, j, cg=cgroups: (i * cg + j, 0, 0),
                         memory_space=pltpu.VMEM),
            *plane_specs,
            pl.BlockSpec((_LW, _LW), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, k, num, num),
                               lambda i, j, cg=cgroups: (i * cg + j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, num, num), jnp.int32),
        scratch_shapes=[pltpu.VMEM((32, wp), jnp.int32)
                        for _ in range(2 * k)],
        interpret=jax.default_backend() != "tpu",
    )(srcc, *plane_args, jnp.asarray(_band_ones(b)))
    return jnp.swapaxes(out, 2, 3)                        # [dy, dx]


@functools.partial(jax.jit, static_argnames=("grid", "num", "chunks", "group"))
def ssd_grid_plane(src_ctus: jnp.ndarray, plane: jnp.ndarray,
                   grid: tuple[int, int], num: int, chunks: int = 8,
                   group: int = 2) -> jnp.ndarray:
    """Full-search SSD grids for a CTU grid, windows read from the plane.

    src_ctus (gr*gc, 64, 64) uint8 row-major CTUs; plane (>= gr*64 + 64,
    >= gc*64 + 64) uint8 — the reference padded by exactly R = 32 on the
    top/left (window of CTU (r, c) = plane[64r : 64r+128, 64c : 64c+128]).
    Returns (n, num, num) int32 exact SSD grids in [dy, dx] orientation,
    bit-exact with ssd_grid on gathered windows.  Requires b = 64,
    num = 65, gc even.
    """
    n, b, _ = src_ctus.shape
    gr, gc = grid
    assert b == 64 and num == _LW - b + 1 and n == gr * gc
    assert gc % 2 == 0, "slab path needs an even CTU-grid width"
    h = b // chunks
    hp_need = gr * 64 + 64
    wp_need = gc * 64 + 64
    hp, wp0 = plane.shape
    assert hp >= hp_need and wp0 >= wp_need
    wp = -(-wp_need // _LW) * _LW
    if wp0 < wp:
        plane = jnp.pad(plane, ((0, 0), (0, wp - wp0)))
    elif wp0 > wp:
        plane = plane[:, :wp]
    if hp > hp_need:
        plane = plane[:hp_need]

    G = group if gc % group == 0 and group % 2 == 0 else 2
    cgroups = gc // G
    srcc = _prep_src_chunked(src_ctus, b, h, chunks)      # (n, h, Q*LW) int8

    kernel = functools.partial(
        _kernel_slab, b=b, h=h, num=num, chunks=chunks, group=G,
        cgroups=cgroups, wp=wp,
    )
    out = pl.pallas_call(
        kernel,
        grid=(gr, cgroups),
        in_specs=[
            pl.BlockSpec((G, h, chunks * _LW),
                         lambda i, j, cg=cgroups: (i * cg + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, wp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, wp), lambda i, j: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, num, num),
                               lambda i, j, cg=cgroups: (i * cg + j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, num, num), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((32, wp), jnp.int32),
            pltpu.VMEM((32, wp), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(srcc, plane, plane, jnp.asarray(_band_ones(b)))
    return jnp.swapaxes(out, 1, 2)                        # [dy, dx]


def _kernel_corr(src_ref, win_ref, sq_ref, band_ref, out_ref, *, b, h,
                 num_dx, num_dy, chunks, group):
    """Chunked kernel with the LAYOUT work moved to XLA.

    Inputs per CTU (prepared by the wrapper, where XLA fuses them into the
    window gather for ~free): src_ref (h, Q*LW) int8 — the CENTERED source
    in chunk-wide layout, zero beyond column b of each block; win_ref
    (LW, LW) int8 — the centered window, zero beyond (wh, ww); sq_ref
    (1, 1) int32 — sum(sc^2).  RHS block q is the window rolled up by q*h
    rows, built with packed-bitcast rolls (4 rows per int32 element — a
    quarter of the elements the r3 kernel's int32-plane rolls moved).
    Window energy stays IN-KERNEL on the MXU: computing it in XLA measured
    0.8-1.1 ms/frame (cumsum lowers poorly on TPU and the (n, 128, 128)
    int32 intermediates cost ~150 MB of HBM) vs ~0.05 ms for the in-VMEM
    _energy_mxu — a measured negative result (docs/DESIGN.md section 6)."""
    Q = chunks
    rows4 = _LW // 4
    for gi in range(group):
        wi = win_ref[gi].astype(jnp.int32)               # centered already
        eyt = _energy_mxu(wi, band_ref[...], b)          # [dx, dy]
        stk = _build_stack_chunked(src_ref[gi], num_dx)  # (num_dx*h, Q*LW)
        wp = pltpu.bitcast(win_ref[gi], jnp.int32)       # (LW/4, LW)
        rhs = pltpu.bitcast(
            jnp.concatenate(
                [wp if q == 0 else
                 pltpu.roll(wp, (rows4 - q * h // 4) % rows4, axis=0)
                 for q in range(Q)],
                axis=1,
            ),
            jnp.int8,
        )                                                # (LW, Q*LW)
        g = jax.lax.dot_general(stk, rhs, _DN1, preferred_element_type=jnp.int32)
        corr = _band_tree(g, h, num_dx, num_dy, _LW)
        out_ref[gi] = sq_ref[gi, 0, 0] + eyt[:num_dx, :num_dy] - 2 * corr


def _prep_src_chunked(src, b, h, chunks):
    """(n, b, b) uint8 -> centered int8 chunk-wide (n, h, Q*LW), zero-padded
    lanes beyond b per block (pure XLA layout ops; fuses with the caller)."""
    n = src.shape[0]
    s8 = (src.astype(jnp.int16) - 128).astype(jnp.int8)
    s8 = s8.reshape(n, chunks, h, b).transpose(0, 2, 1, 3)   # (n, h, Q, b)
    s8 = jnp.pad(s8, ((0, 0), (0, 0), (0, 0), (0, _LW - b)))
    return s8.reshape(n, h, chunks * _LW)


def _prep_win_i8(window, wh, ww):
    """(n, wh, ww) uint8 -> centered int8 (n, LW, LW), zero beyond (wh, ww)."""
    w8 = (window.astype(jnp.int16) - 128).astype(jnp.int8)
    return jnp.pad(w8, ((0, 0), (0, _LW - wh), (0, _LW - ww)))


def _energy_xla(window, b, num_dy, num_dx):
    """Sliding (b, b) box sums of the centered window's squares, oriented
    [dy, dx] — pure XLA (prefix sums + slices), bit-exact integers.  Any
    int32 prefix overflow is benign: the sliding difference of prefix sums
    is exact modulo 2^32 and the true box sum is < 2^31."""
    wc = window.astype(jnp.int32) - 128
    w2 = wc * wc
    csr = jnp.cumsum(w2, axis=1)
    z = jnp.zeros_like(csr[:, :1])
    sr = csr[:, b - 1 : b - 1 + num_dy] - jnp.concatenate(
        [z, csr[:, : num_dy - 1]], axis=1
    )                                                   # (n, num_dy, ww)
    csc = jnp.cumsum(sr, axis=2)
    zc = jnp.zeros_like(csc[:, :, :1])
    return csc[:, :, b - 1 : b - 1 + num_dx] - jnp.concatenate(
        [zc, csc[:, :, : num_dx - 1]], axis=2
    )                                                   # (n, num_dy, num_dx)


def _argmin_mv(ssd, num):
    """First-minimum argmin of the [dx, dy] grid in motion.full_search's
    flattened [dy, dx] row-major order; returns a (1, 8) lane vector
    [dy - r, dx - r, best, 0...]."""
    r = (num - 1) // 2
    best = jnp.min(ssd)
    dxi = jax.lax.broadcasted_iota(jnp.int32, (num, num), 0)
    dyi = jax.lax.broadcasted_iota(jnp.int32, (num, num), 1)
    idx = jnp.min(jnp.where(ssd == best, dyi * num + dxi, jnp.int32(1 << 30)))
    dy, dx = idx // num, idx % num
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    return (jnp.where(lane == 0, dy - r, 0)
            + jnp.where(lane == 1, dx - r, 0)
            + jnp.where(lane == 2, best, 0))


def _kernel_chunked_mv(src_ref, win_ref, band_ref, out_ref, stk_scr, *, b,
                       num, wh, ww, chunks, group, scratch_stack):
    """Chunked-K search + in-kernel argmin: emits (mv, best) per CTU
    directly, so the (num, num) score grids never reach HBM.
    scratch_stack selects the VMEM-scratch stack build (measured SLOWER
    than the concat build on v5e — kept for the record)."""
    for gi in range(group):
        ssd = _chunked_body(
            src_ref[gi], win_ref[gi], band_ref[...],
            b=b, num_dy=num, num_dx=num, wh=wh, ww=ww, chunks=chunks,
            stack_scr=(stk_scr, gi) if scratch_stack else None,
        )
        out_ref[gi] = _argmin_mv(ssd, num)


@functools.partial(jax.jit, static_argnames=("num", "chunks", "group",
                                              "scratch_stack"))
def search_mv(src: jnp.ndarray, windows: jnp.ndarray, num: int,
              chunks: int = 8, group: int = 2, scratch_stack: bool = False):
    """Windowed full search returning (mv (n, 2), best (n,)) directly.

    Same scoring as ssd_grid (chunked path) with the argmin fused into the
    kernel; windows are gathered by the caller (motion.extract_aligned_
    windows — cheap pure-reshape extraction).  Requires the chunked-path
    geometry (b % chunks == 0, (b / chunks) % 8 == 0).
    """
    n, b, _ = src.shape
    wh, ww = b + num - 1, b + num - 1
    assert b % chunks == 0 and (b // chunks) % 8 == 0
    windows = windows[:, :wh, :ww]
    G = min(group, n)
    steps = -(-n // G)
    pad = steps * G - n
    if pad:
        src = jnp.pad(src, ((0, pad), (0, 0), (0, 0)))
        windows = jnp.pad(windows, ((0, pad), (0, 0), (0, 0)))
    h = b // chunks
    kernel = functools.partial(
        _kernel_chunked_mv, b=b, num=num, wh=wh, ww=ww, chunks=chunks,
        group=G, scratch_stack=scratch_stack,
    )
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, wh, ww), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, 1, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * G, 1, 8), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((G, num * h // 4, chunks * _LW), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(src, windows, jnp.asarray(_band_ones(b)))
    out = out[:n, 0]
    return out[:, 0:2], out[:, 2]


def _band_sel(h: int, num: int) -> np.ndarray:
    """(h*LW, LW) int8 0/1: column dy selects the (y, y + dy) diagonal
    pairs, so corr = G.reshape(num_dx, h*LW) @ B computes the whole band
    on the MXU instead of the log2(h) roll tree."""
    m = np.zeros((h * _LW, _LW), np.int8)
    for y in range(h):
        for dy in range(min(num, _LW - y)):
            m[y * _LW + y + dy, dy] = 1
    return m


def _band_mxu(g: jnp.ndarray, h: int, num_dx: int, bsel) -> jnp.ndarray:
    """corr[dx, dy] = sum_y g[dx*h + y, y + dy] as THREE exact int8
    matmuls over the byte split of g (|g| < 2^22; the +-128 centering of
    the low bytes folds into a constant because every bsel column has
    exactly h ones).  The roll tree (_band_tree) moves ~2x the g matrix
    through cross-lane rotates; this trades that for MXU work."""
    g2 = g.reshape(num_dx, h * _LW)
    hi = (g2 >> 16).astype(jnp.int8)                      # in [-33, 32]
    mid = (jnp.bitwise_and(g2 >> 8, 255) - 128).astype(jnp.int8)
    lo = (jnp.bitwise_and(g2, 255) - 128).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    c2 = jax.lax.dot_general(hi, bsel, dn, preferred_element_type=jnp.int32)
    c1 = jax.lax.dot_general(mid, bsel, dn, preferred_element_type=jnp.int32)
    c0 = jax.lax.dot_general(lo, bsel, dn, preferred_element_type=jnp.int32)
    return (c2 << 16) + ((c1 + 128 * h) << 8) + (c0 + 128 * h)


def _base_grids_kernel(src_ref, win_ref, band_ref, bsel_ref, sq_ref,
                       out_ref, *, base, num, group, pu_lists=None):
    """ALL k*k sub-block SSD grids of a CTU from ONE resident window.

    The PU decision needs exact (2R+1)^2 grids at base granularity
    (8/16/32); calling ssd_grid per sub-block re-gathers overlapping
    (base+2R)^2 windows (a ~52 MB slab stack at 1080p/16) and recomputes
    the window energy k^2 times.  Here each grid step loads the CTU's
    source and its single (128, 128) search window once:

      * window energy: ONE _energy_mxu box map per CTU at base size —
        sub-block (i, j)'s energy grid is the map shifted by (base*j,
        base*i) (two packed rolls), since all sub-windows share the plane.
      * per sub-block: the centered window rolls to put the sub-window at
        the origin (packed bitcast rolls, 4 rows per int32 element); the
        sub-source is the rolled+masked source row block; then the same
        chunked rolled-stack matmul + band tree as _kernel_chunked.  The
        roll wrap garbage always lands at rows/cols >= 128 - base*(k-1) =
        base + 2R - ... beyond every read (reads stay < base + 2R - base
        + h of the origin).

    Geometry: 64x64 CTUs with 64 + 2R == 128 (the headline +-32 range),
    base in {8, 16, 32}; h = 8 rows per chunk, Q = base/8 chunks.
    """
    k = 64 // base
    Q = max(1, base // 8)
    h = 8
    for gi in range(group):
        grids = []
        win_u8 = win_ref[gi]                              # (128, 128)
        w32 = win_u8.astype(jnp.int32) - 128
        box = _energy_mxu(w32, band_ref[...], base)       # [dx, dy]
        pw = pltpu.bitcast(
            pltpu.bitcast(win_u8 ^ jnp.uint8(128), jnp.int8), jnp.int32
        )                                                 # (32, 128) packed
        src_u8 = src_ref[gi]                              # (64, 128)
        ps = pltpu.bitcast(
            pltpu.bitcast(src_u8 ^ jnp.uint8(128), jnp.int8), jnp.int32
        )                                                 # (16, 128) packed
        lane = jax.lax.broadcasted_iota(jnp.int32, (16, _LW), 1)

        for i in range(k):
            for j in range(k):
                pws = pw
                if j:
                    pws = pltpu.roll(pws, _LW - base * j, axis=1)
                if i:
                    pws = pltpu.roll(pws, 32 - base * i // 4, axis=0)
                rhs = pltpu.bitcast(
                    jnp.concatenate(
                        [pws if q == 0 else
                         pltpu.roll(pws, 32 - q * h // 4, axis=0)
                         for q in range(Q)],
                        axis=1,
                    ),
                    jnp.int8,
                )                                         # (128, Q*128)
                pss = ps
                if j:
                    pss = pltpu.roll(pss, _LW - base * j, axis=1)
                if i:
                    pss = pltpu.roll(pss, 16 - base * i // 4, axis=0)
                pss = jnp.where(lane < base, pss, 0)
                # Chunk q = packed rows [2q, 2q+2): roll-to-origin + offset-0
                # slice (offset sublane slices feeding a lane concat are
                # rejected by Mosaic).
                srcw = jnp.concatenate(
                    [(pss if q == 0 else
                      pltpu.roll(pss, 16 - q * h // 4, axis=0))[0:2]
                     for q in range(Q)],
                    axis=1,
                )                                         # (2, Q*128)
                stk = srcw
                m = 1
                while m < num:
                    take = min(m, num - m)
                    ext = pltpu.roll(stk[: take * 2], m, axis=1)
                    stk = jnp.concatenate([stk, ext], axis=0)
                    m += take
                stk8 = pltpu.bitcast(stk, jnp.int8)       # (num*8, Q*128)
                g = jax.lax.dot_general(
                    stk8, rhs, _DN1, preferred_element_type=jnp.int32)
                if base >= 16:
                    corr = _band_mxu(g, h, num, bsel_ref[...])[:, :num]
                else:
                    # base == 8: 64 unrolled _band_mxu instances (x3 byte
                    # splits each) explode Mosaic compile time; the roll
                    # tree stays tractable.
                    corr = _band_tree(g, h, num, num, _LW)
                ey = box
                if j:
                    ey = pltpu.roll(ey, _LW - base * j, axis=0)
                if i:
                    ey = pltpu.roll(ey, _LW - base * i, axis=1)
                # srcsq arrives per sub-block as a (1, 1) VMEM read that
                # broadcasts — Mosaic mis-lowered a scalar [i, j] extract
                # from an in-kernel (k, k) value at i > 0 (wrong element),
                # so the sums are computed in XLA instead.
                ssd = sq_ref[gi, i * k + j] + ey[:num, :num] - 2 * corr
                if pu_lists is None:
                    out_ref[gi, i * k + j] = ssd
                else:
                    grids.append(ssd)
        if pu_lists is not None:
            # Decide-in-kernel mode: aggregate the resident sub-grids into
            # every layout's PU grids (integer adds) and argmin each —
            # neither the (k*k, num, num) grids nor their integral image
            # ever touch HBM; the output is one (1, 8) [dy, dx, best] lane
            # vector per PU.
            for p_idx, subs in enumerate(pu_lists):
                pu = grids[subs[0]]
                for t in subs[1:]:
                    pu = pu + grids[t]
                out_ref[gi, p_idx] = _argmin_mv(pu, num)


@functools.partial(jax.jit, static_argnames=("base", "group", "pu_lists"))
def base_layout_decide(src_ctus: jnp.ndarray, windows: jnp.ndarray,
                       base: int, pu_lists, group: int = 2):
    """base_grids_ctu's decide-in-kernel mode: per CTU, aggregate the
    resident sub-block grids into every layout's PU grids and argmin each
    — the (n, k, k, num, num) grids (135 MB at 1080p/16), their integral
    image, and the per-rect slice+argmin XLA passes all disappear.

    pu_lists: tuple of tuples — each PU as the tuple of its sub-block
    indices (i * k + j) in the shared base tiling.  Returns
    (n, len(pu_lists), 3) int32 [dy, dx, best] per PU, bit-exact with the
    integral-image path (tests/test_partition.py)."""
    n, b, _ = src_ctus.shape
    assert b == 64 and windows.shape[-1] == _LW and windows.shape[-2] == _LW
    assert base in (8, 16, 32)
    k = 64 // base
    num = _LW - b + 1
    P = len(pu_lists)
    G = min(group, n)
    steps = -(-n // G)
    pad = steps * G - n
    if pad:
        src_ctus = jnp.pad(src_ctus, ((0, pad), (0, 0), (0, 0)))
        windows = jnp.pad(windows, ((0, pad), (0, 0), (0, 0)))
    src_w = jnp.pad(src_ctus, ((0, 0), (0, 0), (0, _LW - b)),
                    constant_values=128)
    si = src_ctus.astype(jnp.int32) - 128
    sq = (si * si).reshape(-1, k, base, k, base).sum(axis=(2, 4))
    sq = sq.reshape(-1, k * k, 1, 1)
    kernel = functools.partial(_base_grids_kernel, base=base, num=num,
                               group=G, pu_lists=pu_lists)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, _LW, _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * _LW, _LW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, k * k, 1, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, P, 1, 8), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * G, P, 1, 8), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(src_w, windows, jnp.asarray(_band_ones(base)),
      jnp.asarray(_band_sel(8, num)), sq)
    return out[:n, :, 0, :3]


@functools.partial(jax.jit, static_argnames=("base", "group"))
def base_grids_ctu(src_ctus: jnp.ndarray, windows: jnp.ndarray, base: int,
                   group: int = 2):
    """src_ctus (n, 64, 64) uint8, windows (n, 128, 128) uint8 CTU search
    windows (the 64 + 2R == 128 geometry) -> (n, k, k, num, num) int32
    exact SSD grids of every (base x base) sub-block, bit-exact with
    per-sub-block ssd_grid calls (tests/test_search_pallas.py)."""
    n, b, _ = src_ctus.shape
    assert b == 64 and windows.shape[-1] == _LW and windows.shape[-2] == _LW
    assert base in (8, 16, 32)
    k = 64 // base
    num = _LW - b + 1                                     # 65
    G = min(group, n)
    steps = -(-n // G)
    pad = steps * G - n
    if pad:
        src_ctus = jnp.pad(src_ctus, ((0, pad), (0, 0), (0, 0)))
        windows = jnp.pad(windows, ((0, pad), (0, 0), (0, 0)))
    src_w = jnp.pad(src_ctus, ((0, 0), (0, 0), (0, _LW - b)),
                    constant_values=128)
    si = src_ctus.astype(jnp.int32) - 128
    sq = (si * si).reshape(-1, k, base, k, base).sum(axis=(2, 4))
    sq = sq.reshape(-1, k * k, 1, 1)                      # (N, k*k, 1, 1)
    kernel = functools.partial(_base_grids_kernel, base=base, num=num,
                               group=G)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, _LW, _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * _LW, _LW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, k * k, 1, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, k * k, num, num), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * G, k * k, num, num),
                                       jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(src_w, windows, jnp.asarray(_band_ones(base)),
      jnp.asarray(_band_sel(8, num)), sq)
    # kernel emits [dx, dy]; the ssd_grid contract is [dy, dx]
    return jnp.swapaxes(out[:n].reshape(n, k, k, num, num), -1, -2)


def _argmin_mv_masked(ssd, num):
    """_argmin_mv over an (R, C) grid whose valid region is [0, num)^2
    ([dx, dy] orientation), R >= num, C >= num."""
    r = (num - 1) // 2
    rows, cols = ssd.shape
    dxi = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    dyi = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    valid = (dxi < num) & (dyi < num)
    big = jnp.int32(2147483647)
    best = jnp.min(jnp.where(valid, ssd, big))
    idx = jnp.min(jnp.where(valid & (ssd == best), dyi * num + dxi, big))
    dy, dx = idx // num, idx % num
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    return (jnp.where(lane == 0, dy - r, 0)
            + jnp.where(lane == 1, dx - r, 0)
            + jnp.where(lane == 2, best, 0))


def _fc_decide_kernel(src_ref, win_ref, band_ref, sq_ref, out_ref, *,
                      num, group, pu_lists):
    """Fine/coarse base-16 PU decision: dx = 16c + f.

    The r4 decide kernel (_base_grids_kernel) pays 16 per-sub-block rolled
    stack builds whose 16-wide sources occupy 1/8 of each 128-lane K block
    (273M issued MACs/CTU) plus 16 _band_mxu byte-split passes.  Here the
    FINE shift f in [0, 16) rides the LHS (it needs only 32-lane slack, so
    four 4-row K-chunks pack one 128-lane block FULLY) and the COARSE
    shift 16c rides shared RHS copies along N:

      g_ij[(f, u), 128c + yy] = sum_q sum_v src[16i+4q+u, 16j+v]
                                 * win[yy + 4q, 16(j+c) + f + v]
      corr_ij(16c + f, dy)    = sum_u g_ij[(f, u), 128c + 16i + u + dy]

    LHS_ij is ONE packed int32 row (the four 4-row chunks of sub-block
    (i, j) laid at 32-lane spans) fine-doubled to 16 f-slabs — a 16x
    smaller build than r4's per-sub-block stacks.  The RHS is assembled
    ONCE per CTU for all 8 lane-shifts s = j + c (each block q = the
    window rolled up 4q rows, lane-shifted 16s, masked to 32 lanes);
    wrap-around garbage only ever reaches outputs with dx >= 65, which
    the masked argmin discards (see the bound walk-through in
    docs/DESIGN.md section 8).  Per sub-block ONE (64, 128) x (640, 128)
    matmul replaces the r4 stack matmul + 3-way _band_mxu split.

    Covers base == 16 (the default pu_layouts' granularity); other bases
    use _base_grids_kernel."""
    base, k, P = 16, 4, len(pu_lists)
    for gi in range(group):
        win_u8 = win_ref[gi]                              # (128, 128)
        w32 = win_u8.astype(jnp.int32) - 128
        box = _energy_mxu(w32, band_ref[...], base)       # [dx, dy]
        pw = pltpu.bitcast(
            pltpu.bitcast(win_u8 ^ jnp.uint8(128), jnp.int8), jnp.int32
        )                                                 # (32, 128) packed
        ps = pltpu.bitcast(
            pltpu.bitcast(src_ref[gi] ^ jnp.uint8(128), jnp.int8), jnp.int32
        )                                                 # (16, 128) packed

        # --- shared RHS: 8 s-shifts x 4 row-chunk blocks ------------------
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (32, _LW), 1)
        shq = [pw if q == 0 else pltpu.roll(pw, 32 - q, axis=0)
               for q in range(4)]                         # win rows + 4q
        rhs_blocks = []
        for s in range(8):
            acc = None
            for q in range(4):
                t = shq[q] if s == 0 else pltpu.roll(
                    shq[q], (_LW - 16 * s) % _LW, axis=1)
                t = jnp.where(lane32 < 32, t, 0)
                if q:
                    t = pltpu.roll(t, 32 * q, axis=1)
                acc = t if acc is None else acc + t
            rhs_blocks.append(acc)
        rhs_all = pltpu.bitcast(
            jnp.concatenate(rhs_blocks, axis=0), jnp.int8
        )                                                 # (8*128, 128)

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LW), 1)
        grids = []
        for i in range(k):
            for j in range(k):
                # LHS: one packed row = the 4 chunks at 32-lane spans.
                b0 = None
                for q in range(4):
                    row = ps[4 * i + q : 4 * i + q + 1]   # (1, 128)
                    t = pltpu.roll(row, (_LW + 32 * q - 16 * j) % _LW, axis=1)
                    t = jnp.where(
                        (lane1 >= 32 * q) & (lane1 < 32 * q + base), t, 0)
                    b0 = t if b0 is None else b0 + t
                stk = b0
                m = 1
                while m < 16:
                    take = min(m, 16 - m)
                    ext = pltpu.roll(stk[:take], m, axis=1)
                    stk = jnp.concatenate([stk, ext], axis=0)
                    m += take
                lhs8 = pltpu.bitcast(stk, jnp.int8)       # (64, 128) (f, u)

                rhs_j = rhs_all[_LW * j : _LW * j + 5 * _LW]
                g = jax.lax.dot_general(
                    lhs8, rhs_j, _DN1, preferred_element_type=jnp.int32
                )                                         # (64, 640)
                t = _band_tree(g, 4, 16, 640, 640)        # (16, 640)
                t = pltpu.roll(t, (640 - 16 * i) % 640, axis=1)
                corr80 = jnp.concatenate(
                    [t[:, _LW * c : _LW * (c + 1)] for c in range(5)],
                    axis=0,
                )                                         # (80, 128) [dx, dy]
                ey = pltpu.roll(box[16 * j : 16 * j + 80],
                                (_LW - 16 * i) % _LW, axis=1)
                grids.append(sq_ref[gi, i * k + j] + ey - 2 * corr80)

        for p_idx, subs in enumerate(pu_lists):
            pu = grids[subs[0]]
            for tix in subs[1:]:
                pu = pu + grids[tix]
            out_ref[gi, p_idx] = _argmin_mv_masked(pu, num)


@functools.partial(jax.jit, static_argnames=("pu_lists", "group"))
def base_layout_decide_fc(src_ctus: jnp.ndarray, windows: jnp.ndarray,
                          pu_lists, group: int = 2):
    """Fine/coarse base-16 decide-in-kernel PU selection (_fc_decide_kernel)
    — same contract and bit-identical results as
    base_layout_decide(base=16) (tests/test_partition.py), measured faster
    on v5e."""
    n, b, _ = src_ctus.shape
    assert b == 64 and windows.shape[-1] == _LW and windows.shape[-2] == _LW
    base, k = 16, 4
    num = _LW - b + 1
    P = len(pu_lists)
    G = min(group, n)
    steps = -(-n // G)
    pad = steps * G - n
    if pad:
        src_ctus = jnp.pad(src_ctus, ((0, pad), (0, 0), (0, 0)))
        windows = jnp.pad(windows, ((0, pad), (0, 0), (0, 0)))
    src_w = jnp.pad(src_ctus, ((0, 0), (0, 0), (0, _LW - b)),
                    constant_values=128)
    si = src_ctus.astype(jnp.int32) - 128
    sq = (si * si).reshape(-1, k, base, k, base).sum(axis=(2, 4))
    sq = sq.reshape(-1, k * k, 1, 1)
    kernel = functools.partial(_fc_decide_kernel, num=num, group=G,
                               pu_lists=pu_lists)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, _LW, _LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LW, _LW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, k * k, 1, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, P, 1, 8), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * G, P, 1, 8), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(src_w, windows, jnp.asarray(_band_ones(base)), sq)
    return out[:n, :, 0, :3]


# ---------------------------------------------------------------------------
# In-kernel-DMA full search: window fetch + SSD grid + argmin in ONE kernel.
# ---------------------------------------------------------------------------

_SLAB_C = 256  # aligned column span: worst-case 128-lane block offset (127)
               # plus the 128-wide search window


def _search_kernel_dma(off_ref, src_ref, plane_ref, band_ref, out_ref,
                       slab_scr, stk_scr, sems, *, b, num, chunks, group):
    """Per CTU: DMA an aligned (s, 256) slab of the reference plane at the
    CTU's POSITION (known per frame, scalar-prefetched — nothing here is
    data-dependent), de-skew the 128-lane block offset with ONE packed lane
    roll (4 rows ride each int32 via bitcast, so the roll moves 1/4 the
    elements), run the chunked-K SSD grid on the resident window, and emit
    (mv, best) directly — the (num, num) grid never touches HBM and the
    separate window-extraction stage disappears.

    This keeps the search as its OWN kernel (unlike mega_pallas, whose
    single-residency monolith measured slower: docs/DESIGN.md section 6) so
    XLA still overlaps it with the fused refine+residual kernel's DMAs.
    Tie-break matches motion.full_search: first minimum of the flattened
    [dy, dx] row-major grid.
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    G = group
    s = b + num - 1  # == _LW for the covered geometry

    def dma(step, slot, g):
        j = step * G + g
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(off_ref[j, 0] * 8, s),
                         pl.ds(off_ref[j, 1] * _LW, _SLAB_C)],
            slab_scr.at[slot, g],
            sems.at[slot, g],
        )

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        for g in range(G):
            dma(i, slot, g).start()

    @pl.when(i + 1 < nsteps)
    def _():
        for g in range(G):
            dma(i + 1, 1 - slot, g).start()

    for g in range(G):
        dma(i, slot, g).wait()

    for g in range(G):
        dxc = off_ref[i * G + g, 2]
        packed = pltpu.bitcast(slab_scr[slot, g], jnp.int32)   # (s/4, 256)
        packed = pltpu.roll(packed, (_SLAB_C - dxc) % _SLAB_C, axis=1)
        win = pltpu.bitcast(packed, jnp.uint8)[:, :_LW]        # (s, 128)
        ssd = _chunked_body(
            src_ref[g], win, band_ref[...],
            b=b, num_dy=num, num_dx=num, wh=s, ww=s, chunks=chunks,
            stack_scr=(stk_scr, g),
        )                                                      # [dx, dy]
        out_ref[g] = _argmin_mv(ssd, num)


@functools.partial(jax.jit, static_argnames=("r", "chunks", "group"))
def search_mv_dma(src_ctus: jnp.ndarray, ref_padded: jnp.ndarray,
                  positions: jnp.ndarray, r: int, chunks: int = 8,
                  group: int = 2):
    """Full-search motion estimation with in-kernel window DMA + argmin.

    src_ctus (n, 64, 64) uint8; ref_padded the plane padded by (r + 3)
    top/left, (r + 4) bottom/right (loop.py's construction); positions
    (n, 2) int32 CTU [y, x] in unpadded coords, every coordinate a
    multiple of 8 (the CTU grid guarantees multiples of 64).  Covers the
    headline geometry b == 64, b + 2r == 128; other geometries use
    ssd_grid + XLA argmin (motion.full_search).

    Returns (mv (n, 2) int32 [dy, dx] in [-r, r], best (n,) int32),
    bit-identical to motion.full_search with the Pallas ssd_grid
    (tests/test_search_pallas.py).

    Reference analogue: sad_a.asm:56-194's role — but here the *entire*
    search stage cost, including the window loads the asm's caller pays
    for, lives in the one kernel (VERDICT r3 #1).
    """
    n, b, _ = src_ctus.shape
    num = 2 * r + 1
    s = b + 2 * r
    assert b == 64 and s == _LW, "search_mv_dma covers the 64/+-32 geometry"
    hp, wp = ref_padded.shape
    # The search window of the CTU at (y0, x0) starts at padded coords
    # (y0 + 3, x0 + 3).  Five extra top rows land window rows on the 8-row
    # DMA grid (y0 + 8, y0 % 8 == 0); columns keep their 128-block offset
    # (de-skewed in kernel).  Right pad: the aligned 256-lane slab of the
    # rightmost CTU (x0 = w - 64) reaches at most x0 + 259 = wp + 124;
    # round the width to the 128-lane multiple Mosaic requires.  Rows:
    # the bottom CTU's slab ends at (h - 64) + 8 + 128 = hp + 1 - 2r + ...
    # computed exactly below.
    need_r = max(0, (hp - (2 * r + 7) - b) + 8 + s - (hp + 5))
    need_c = max(0, (wp - (2 * r + 7) - b) + 3 + _SLAB_C - wp)
    need_c += -(wp + need_c) % _LW
    plane = jnp.pad(ref_padded, ((5, need_r), (0, need_c)))

    G = min(group, n)
    steps = -(-n // G)
    pad_n = steps * G - n
    if pad_n:
        src_ctus = jnp.pad(src_ctus, ((0, pad_n), (0, 0), (0, 0)))
        positions = jnp.pad(positions, ((0, pad_n), (0, 0)))
    y = positions[:, 0] + 8
    x = positions[:, 1] + 3
    off = jnp.stack([y // 8, x // _LW, x % _LW], axis=-1)

    kernel = functools.partial(
        _search_kernel_dma, b=b, num=num, chunks=chunks, group=G,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, b, b), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_LW, _LW), lambda i, off: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, 1, 8), lambda i, off: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, s, _SLAB_C), jnp.uint8),
            pltpu.VMEM((G, num * (b // chunks) // 4, chunks * _LW), jnp.int32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((steps * G, 1, 8), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(off, src_ctus, plane, jnp.asarray(_band_ones(b)))
    out = out[:n, 0]
    return out[:, 0:2], out[:, 2]
