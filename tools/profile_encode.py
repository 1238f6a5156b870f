"""Per-stage profiler for the encode inner loop on the current jax backend.

Times each stage of encode_inter_frame in isolation (same shapes as
bench.py's 1080p headline config) plus the composed frame, and prints an
achieved-vs-peak FLOPs line per stage (the roofline/MFU accounting SURVEY.md
section 5 prescribes).  Run on the TPU to find the next bottleneck:

    python tools/profile_encode.py [--height 1088 --width 1920 --range 32]

Diagnostics only — bench.py remains the driver-facing benchmark.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

# v5e per-dtype MXU peaks; the fraction line uses the int8 peak (the hot
# matmuls ride the s8 path).  Diagnostics only.
PEAK_FLOPS = 394e12  # int8 TOPS (bf16 peak is ~197e12)
HBM_GBPS = 819e9


def timed(fn, *args, iters=32, warmup=None):
    """Chained on-device timing: run ``fn`` inside one jitted fori_loop
    (first arg perturbed per-iteration so XLA cannot hoist the body) at TWO
    chain lengths and difference them, cancelling the ~25 ms per-dispatch
    relay floor exactly; a checksum fetch gates completion (the relay ACKs
    block_until_ready before compute finishes)."""
    import jax
    import jax.numpy as jnp

    first, rest = args[0], args[1:]
    is_arr = [hasattr(a, "shape") for a in rest]
    arr_args = [a for a, f in zip(rest, is_arr) if f]

    def rebuild(arrs):
        it = iter(arrs)
        return [next(it) if f else a for a, f in zip(rest, is_arr)]

    def chain_of(k):
        @jax.jit
        def chain(x0, *xs):
            def body(i, acc):
                x = x0 + (i % 2).astype(x0.dtype)
                out = fn(x, *rebuild(xs))
                leaves = jax.tree.leaves(out)
                return acc + jnp.sum(leaves[0].astype(jnp.int32)) % 65536
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return chain

    short = max(1, iters // 4)
    lc, sc = chain_of(iters), chain_of(short)
    int(lc(first, *arr_args)); int(sc(first, *arr_args))  # compile + warm
    bl = bs = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); int(lc(first, *arr_args))
        bl = min(bl, time.perf_counter() - t0)
        t0 = time.perf_counter(); int(sc(first, *arr_args))
        bs = min(bs, time.perf_counter() - t0)
    return max((bl - bs) / (iters - short), 1e-9)


def line(name, t, flops=None, bytes_=None):
    s = f"{name:34s} {t * 1e3:8.3f} ms"
    if flops:
        s += f"  {flops / t / 1e12:7.2f} TFLOP/s ({flops / t / PEAK_FLOPS * 100:5.1f}% MXU peak)"
    if bytes_:
        s += f"  {bytes_ / t / 1e9:7.1f} GB/s ({bytes_ / t / HBM_GBPS * 100:5.1f}% HBM)"
    print(s, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--range", type=int, default=32, dest="srange")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hevcasm_tpu.encode import EncodeConfig
    from hevcasm_tpu.encode import ctu as ctu_mod
    from hevcasm_tpu.encode import motion
    from hevcasm_tpu.encode.loop import encode_inter_frame, _residual_pipeline
    from hevcasm_tpu import registry

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)

    h, w, r = args.height, args.width, args.srange
    b = 64
    gr, gc = h // b, w // b
    n = gr * gc
    num = 2 * r + 1
    cfg = EncodeConfig(search_range=r, qp=32)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    cur = jnp.asarray(base[2 : 2 + h, 3 : 3 + w])
    ref = jnp.asarray(base[:h, :w])

    src = ctu_mod.tile_frame(cur, b)
    pos = motion.ctu_positions(gr, gc, b)
    ref_padded = ctu_mod.pad_frame(ref, r + motion.PAD_L, r + motion.PAD_R,
                                   r + motion.PAD_L, r + motion.PAD_R)
    win = jax.jit(lambda p: motion.extract_aligned_windows(
        p, (motion.PAD_L, motion.PAD_L), (gr, gc), b, b + 2 * r))(ref_padded)
    win = jax.block_until_ready(win)

    # --- stage: window extraction -------------------------------------
    t = timed(jax.jit(lambda p: motion.extract_aligned_windows(
        p, (motion.PAD_L, motion.PAD_L), (gr, gc), b, b + 2 * r)), ref_padded,
        iters=args.iters)
    line("extract_aligned_windows", t, bytes_=n * (b + 2 * r) ** 2 * 2)

    # --- stage: ssd_grid (search scoring; best tier: Pallas on TPU) -----
    ssd_grid = registry.get("ssd_grid")
    flops_corr = 2 * n * num * b * b * (b + num - 1)  # stage-1 matmuls
    t = timed(ssd_grid, src, win, num, num, iters=args.iters)
    line(f"ssd_grid ({n}x +-{r})", t, flops=flops_corr)

    # --- stage: full_search (scoring + argmin) --------------------------
    fs = jax.jit(lambda s, p: motion.full_search(
        s, p, pos, r, grid_fn=ssd_grid, grid=(gr, gc)))
    t = timed(fs, src, ref_padded, iters=args.iters)
    line("full_search total", t, flops=flops_corr)
    mv, _ = jax.block_until_ready(fs(src, ref_padded))

    # --- stage: quarter-pel refinement ----------------------------------
    from hevcasm_tpu.kernels.interp_xla import refine_quarter_pel_mxu

    def refine(s, p, m):
        start = pos + m + r
        wref = motion.extract_windows(p, start, b + motion.TAPS - 1)
        return refine_quarter_pel_mxu(s, wref)

    t = timed(jax.jit(refine), src, ref_padded, mv, iters=args.iters)
    # 4 H passes (K=8 banded (71,64)) + 32 V passes as dense banded matmuls
    flops_ref = 2 * n * (4 * 71 * 71 * 64 + 32 * 64 * 71 * 64)
    line("refine_qpel (mxu)", t, flops=flops_ref)
    pred = jax.block_until_ready(jax.jit(refine)(src, ref_padded, mv))[0]

    # --- stage: residual pipeline ----------------------------------------
    resid = jax.jit(lambda s, p: _residual_pipeline(s, p, cfg, intra=False))
    t = timed(resid, src, pred, iters=args.iters)
    flops_resid = 2 * 4 * 2 * n * b * b * b  # 4 passes x hi/lo x (nB,B)@(B,B)
    line("residual pipeline (mxu)", t, flops=flops_resid)

    # --- stage: fused-DMA inter kernel (refine + residual, in-kernel DMA)
    if jax.default_backend() == "tpu":
        from hevcasm_tpu.kernels.interp_pallas import inter_ctu_fused_dma

        scale, shift, offset = cfg.quant_params(False)
        dscale, dshift = cfg.dequant_params()

        def dma_stage(s, p, m):
            return inter_ctu_fused_dma(
                s, p, pos + m + r, scale, shift, offset, dscale, dshift
            )[0]

        t = timed(jax.jit(dma_stage), src, ref_padded, mv, iters=args.iters)
        line("inter_ctu_fused_dma", t, flops=flops_ref + flops_resid)

    # --- composed frame ---------------------------------------------------
    for impl in ("stages", "fused_dma"):
        if impl == "fused_dma" and jax.default_backend() != "tpu":
            continue
        icfg = EncodeConfig(search_range=r, qp=32, inter_impl=impl)
        step = jax.jit(lambda c, rf, icfg=icfg: encode_inter_frame(c, rf, icfg))
        t = timed(step, cur, ref, iters=args.iters)
        line(f"encode_inter_frame TOTAL ({impl})", t)
        print(f"-> {n / t:,.0f} CTU/s   {1 / t:.1f} fps {w}x{h}", flush=True)


if __name__ == "__main__":
    main()
