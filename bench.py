"""Benchmark entry point for the driver: encodes 1080p inter frames on one
chip and reports CTUs/sec/chip for the SAD(+MC)+transform+quant inner loop —
the BASELINE.json headline metric.

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.

Methodology notes:
* Frames are chained ON DEVICE (lax.fori_loop inside one jit) and a checksum
  of the final reconstruction is fetched, so per-dispatch relay latency
  (~25 ms in this environment) is amortized over the chain AND cannot ACK
  before the work is done.  The per-dispatch floor is estimated by timing the
  same chain at two lengths (the difference cancels the fixed dispatch cost)
  rather than with a trivial-body chain — a no-work chain has been observed
  to wedge the relay indefinitely.
* The measurement runs in a child process with a watchdog: the TPU relay
  occasionally wedges a device->host transfer indefinitely; a hung attempt
  is killed and retried rather than hanging the driver.  The child emits a
  provisional JSON line as soon as the first converged measurement exists,
  so even a late wedge still yields a result (the parent keeps the LAST
  line, recovering partial output from a timed-out child).
"""

import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# v5e per-dtype MXU peaks.  The essential-work MFU is the headline (the
# minimum arithmetic the algorithm requires, vs the int8 peak the search
# matmuls run at); issued-work figures (counting padding and redundant
# candidate work) are diagnostics only (VERDICT r2 weak #4).
PEAK_INT8_OPS = 394e12
PEAK_BF16_FLOPS = 197e12


def measure():
    import jax

    from hevcasm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from hevcasm_tpu.encode import EncodeConfig
    from hevcasm_tpu.encode.loop import encode_inter_frame

    dev = jax.devices()[0]
    log(f"device: {dev}")

    h, w = 1088, 1920  # 1080p padded to CTU multiple: 17x30 = 510 CTUs
    ctus = (h // 64) * (w // 64)
    # fused_dma measured fastest of the four inter_impl modes on v5e
    # (stages 4.37 / fused 2.63 / fused_batched 2.04 / fused_dma 1.64
    # ms/frame, r3 sweep; all bit-exact — tests/test_inter_fused.py).
    cfg = EncodeConfig(search_range=32, qp=32, inter_impl="fused_dma")

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    cur = jnp.asarray(base[2 : 2 + h, 3 : 3 + w])
    ref = jnp.asarray(base[:h, :w])

    t0 = time.perf_counter()
    out = encode_inter_frame(cur, ref, cfg)
    jax.block_until_ready(out)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    psnr = float(out["psnr_db"])

    def chain_of(iters):
        @jax.jit
        def chain(c, r0):
            def f(_, r):
                return encode_inter_frame(c, r, cfg)["recon"]

            r = jax.lax.fori_loop(0, iters, f, r0)
            return jnp.sum(r.astype(jnp.uint32))

        return chain

    iters_long, iters_short = 100, 25
    long_chain = chain_of(iters_long)
    short_chain = chain_of(iters_short)
    t0 = time.perf_counter()
    c1 = int(long_chain(cur, ref))
    log(f"chain compile+run: {time.perf_counter() - t0:.1f}s (checksum {c1})")

    def best_of(chain, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(cur, ref))
            best = min(best, time.perf_counter() - t0)
        return best

    t_long = best_of(long_chain)

    def emit(frame_s, note):
        ctus_per_sec = ctus / frame_s
        # Essential work per CTU (the minimum the algorithm requires):
        # search correlation 65^2 x 64^2 MACs (int8 domain), qpel refine
        # 4 H FIRs + 16 V FIRs at 8 taps, residual 4 block-transform passes
        # of 8 MACs/coeff over 64x64.  Everything else the kernels issue
        # (K-padding, full-stack matmuls, unused candidate quadrants) is
        # overhead and must not count as achievement.
        es_search = 65 * 65 * 64 * 64 * 2
        es_refine = (4 * 71 * 64 + 16 * 64 * 64) * 8 * 2
        es_resid = 4 * 64 * 64 * 8 * 2
        fl_essential = ctus * (es_search + es_refine + es_resid)
        # Issued-MXU-work diagnostics (padding and redundant candidates
        # included), split by the dtype path they ride.
        is_int8 = ctus * ((65 * 64) * 128 * 128 + 2 * 256 * 128 * 256) * 2
        is_bf16 = ctus * (128 * 128 * 256 + 16 * 64 ** 3) * 2
        mfu = fl_essential / frame_s / PEAK_INT8_OPS * 100
        log(
            f"[{note}] {frame_s * 1e3:.2f}ms/frame -> "
            f"{ctus_per_sec:.0f} CTUs/s, {1 / frame_s:.1f} fps 1080p, "
            f"first-frame psnr {psnr:.2f}dB"
        )
        log(
            f"essential-work {fl_essential / frame_s / 1e12:.1f} TFLOP/s = "
            f"{mfu:.1f}% of int8 peak; issued-work diagnostic: "
            f"{is_int8 / frame_s / 1e12:.1f} TOP/s int8 "
            f"({is_int8 / frame_s / PEAK_INT8_OPS * 100:.1f}% of int8 peak) + "
            f"{is_bf16 / frame_s / 1e12:.1f} TFLOP/s bf16 "
            f"({is_bf16 / frame_s / PEAK_BF16_FLOPS * 100:.1f}% of bf16 peak)"
        )
        print(
            json.dumps(
                {
                    "metric": "1080p_ctus_per_sec_per_chip",
                    "value": round(ctus_per_sec, 1),
                    "unit": "CTU/s",
                    "vs_baseline": round(ctus_per_sec / 63432.0, 2),
                    "mfu_essential_pct": round(mfu, 2),
                    "ms_per_frame": round(frame_s * 1e3, 3),
                }
            ),
            flush=True,
        )

    # Provisional number (dispatch cost amortized over 100 iters but not
    # cancelled) in case the short-chain refinement wedges.
    emit(t_long / iters_long, "provisional, floor amortized only")

    # Two-length difference cancels the fixed per-dispatch cost exactly.
    t_short = best_of(short_chain)
    frame_s = (t_long - t_short) / (iters_long - iters_short)
    floor_s = t_long - frame_s * iters_long
    log(f"dispatch floor: {floor_s * 1e3:.1f} ms (two-length difference)")
    if not (0.0 <= floor_s <= 0.05) or frame_s <= 0:
        # Relay jitter poisoned one of the chain samples (floors observed
        # ~10-25 ms; a 75 ms "floor" means a slow outlier slipped through
        # best-of): re-sample both chains and re-difference.
        log("implausible floor; re-sampling chains")
        t_long = min(t_long, best_of(long_chain))
        t_short = min(t_short, best_of(short_chain))
        frame_s = (t_long - t_short) / (iters_long - iters_short)
        floor_s = t_long - frame_s * iters_long
        log(f"dispatch floor (resampled): {floor_s * 1e3:.1f} ms")
    if not (0.0 <= floor_s <= 0.05) or frame_s <= 0:
        # Still implausible: fall back to the amortized estimate (floor
        # divided across the long chain) rather than report garbage.
        frame_s = t_long / iters_long
        floor_s = 0.0
        emit(frame_s, "final, floor amortized (two-length diff unstable)")
    else:
        emit(frame_s, "final, floor cancelled")

    # ---- secondary configs (diagnostics, stderr JSON; the driver's one
    # stdout line stays the headline).  Structured pan content so PSNR/nnz
    # mean something (VERDICT r3 #5 'real-content measurement'), the RDO
    # decision config, and the full 4:2:0 frame.  The measured dispatch
    # floor from the headline chains is subtracted from single chains.
    def measure_cfg(name, fn, cur0, ref0, iters=30, extra=()):
        @jax.jit
        def chain(c, r0):
            def f(i, rr):
                return fn(c, rr)

            rr = jax.lax.fori_loop(0, iters, f, r0)
            return jnp.sum(rr.astype(jnp.uint32))

        int(chain(cur0, ref0))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(chain(cur0, ref0))
            best = min(best, time.perf_counter() - t0)
        fs = (best - floor_s) / iters
        rec = {"config": name}
        if fs <= 0:
            fs = best / iters
            rec["floor_amortized"] = True
        rec.update({"ms_per_frame": round(fs * 1e3, 3),
                    "fps_1080p": round(1 / fs, 1)})
        rec.update(extra)
        log(json.dumps(rec))

    smooth = base.astype(np.float32)
    for _ in range(2):
        smooth = (np.roll(smooth, 1, 0) + smooth + np.roll(smooth, -1, 0)) / 3
        smooth = (np.roll(smooth, 1, 1) + smooth + np.roll(smooth, -1, 1)) / 3
    pan = np.clip(smooth, 0, 255).astype(np.uint8)
    # Split-motion pan within the +-32 search range (tools/bench_rdo.py's
    # content): top half pans (+3, +2), bottom half (-5, -7).
    sref = jnp.asarray(pan[32 : 32 + h, 32 : 32 + w])
    scur = np.empty((h, w), np.uint8)
    scur[: h // 2] = pan[35 : 35 + h // 2, 34 : 34 + w]
    scur[h // 2 :] = pan[27 + h // 2 : 27 + h, 25 : 25 + w]
    scur = jnp.asarray(scur)

    sout = encode_inter_frame(scur, sref, cfg)
    measure_cfg(
        "structured_pan_fused_dma",
        lambda c, r: encode_inter_frame(c, r, cfg)["recon"], scur, sref,
        extra={"psnr_db": round(float(sout["psnr_db"]), 2),
               "nnz": int(sout["nnz"])},
    )

    rdo_cfg = EncodeConfig(search_range=32, qp=32, pu_decision=True)
    rout = encode_inter_frame(scur, sref, rdo_cfg)
    measure_cfg(
        "structured_pan_rdo_pu",
        lambda c, r: encode_inter_frame(c, r, rdo_cfg)["recon"], scur, sref,
        iters=10,
        extra={"psnr_db": round(float(rout["psnr_db"]), 2)},
    )

    from hevcasm_tpu.encode.video import YuvFrame, encode_inter_frame_yuv

    cb0 = jnp.asarray(pan[: h // 2, : w // 2])
    cb1 = jnp.asarray(pan[1 : 1 + h // 2, 2 : 2 + w // 2])
    yout = encode_inter_frame_yuv(
        YuvFrame(scur, cb1, cb1), YuvFrame(sref, cb0, cb0), cfg)
    measure_cfg(
        "yuv420_fused_dma",
        lambda c, r: encode_inter_frame_yuv(
            YuvFrame(c, cb1, cb1), YuvFrame(r, cb0, cb0), cfg)["recon"].y,
        scur, sref,
        extra={"psnr_y": round(float(yout["psnr_y"]), 2)},
    )

    # ---- Y4M clip row: the full file path (hevcasm_tpu.io Y4M reader ->
    # device -> encode).  No real footage is reachable from this
    # environment (zero egress), so the clip is GENERATED: multi-octave
    # value-noise background, textured moving objects, global pan and film
    # grain — natural-video-like statistics rather than the pure-pan row
    # above (VERDICT r4 missing #5).
    from hevcasm_tpu import io as hio

    clip_path = "/tmp/hevcasm_clip.y4m"
    if not os.path.exists(clip_path):
        crng = np.random.default_rng(7)
        hh, ww = h + 64, w + 64
        bg = np.zeros((hh, ww), np.float32)
        for octave in (32, 64, 128, 256):
            g = crng.normal(0, 1, (hh // octave + 2, ww // octave + 2))
            gi = np.kron(g, np.ones((octave, octave)))[:hh, :ww]
            bg += gi * octave
        bg = 128 + 70 * bg / np.abs(bg).max()
        objs = [(crng.integers(0, hh - 200), crng.integers(0, ww - 200),
                 crng.integers(60, 200), crng.integers(-6, 7),
                 crng.integers(-6, 7), float(crng.integers(40, 220)))
                for _ in range(12)]
        tex = crng.normal(0, 12, (hh, ww))
        frames = []
        for t in range(2):
            f = np.roll(bg + tex, (2 * t, 3 * t), axis=(0, 1)).copy()
            for (oy, ox, sz, vy, vx, val) in objs:
                y0 = int(oy + vy * t) % (hh - sz)
                x0 = int(ox + vx * t) % (ww - sz)
                f[y0 : y0 + sz, x0 : x0 + sz] = (
                    0.5 * f[y0 : y0 + sz, x0 : x0 + sz] + 0.5 * val)
            f = f + crng.normal(0, 2.0, (hh, ww))          # film grain
            ya = np.clip(f[:h, :w], 0, 255).astype(np.uint8)
            ca = np.clip(f[: h // 2, : w // 2] * 0.5 + 64, 0, 255).astype(np.uint8)
            frames.append(hio.YuvArrays(ya, ca, 255 - ca))
        hio.write_y4m(clip_path, frames, w, h)
    clip = list(hio.iter_frames(clip_path))
    ccur = YuvFrame(jnp.asarray(clip[1].y), jnp.asarray(clip[1].cb),
                    jnp.asarray(clip[1].cr))
    cref = YuvFrame(jnp.asarray(clip[0].y), jnp.asarray(clip[0].cb),
                    jnp.asarray(clip[0].cr))
    cout = encode_inter_frame_yuv(ccur, cref, cfg)
    measure_cfg(
        "y4m_clip_fused_dma",
        lambda c, r: encode_inter_frame_yuv(
            YuvFrame(c, ccur.cb, ccur.cr), YuvFrame(r, cref.cb, cref.cr),
            cfg)["recon"].y,
        ccur.y, cref.y,
        extra={"psnr_y": round(float(cout["psnr_y"]), 2),
               "nnz": int(cout["nnz"])},
    )

    # ---- B-frame row: the fused bi kernel (both refine windows DMA'd
    # in-kernel, per-reference refinement, (r0+r1+64)>>7 combine, shared
    # residual) on the structured 4:2:0 content.
    from hevcasm_tpu.encode.video import encode_b_frame_yuv

    sref2 = jnp.asarray(pan[30 : 30 + h, 28 : 28 + w])
    bout = encode_b_frame_yuv(
        YuvFrame(scur, cb1, cb1), YuvFrame(sref, cb0, cb0),
        YuvFrame(sref2, cb0, cb0), cfg)
    measure_cfg(
        "b_frame_yuv420_fused_bi",
        lambda c, r: encode_b_frame_yuv(
            YuvFrame(c, cb1, cb1), YuvFrame(r, cb0, cb0),
            YuvFrame(sref2, cb0, cb0), cfg)["recon"].y,
        scur, sref, iters=20,
        extra={"psnr_y": round(float(bout["psnr_y"]), 2)},
    )

    # ---- closed-loop I-frame row (the wavefront intra seed every closed
    # GOP pays; VERDICT r4 weak #6 priced it unmeasured).
    from hevcasm_tpu.encode.intra_wavefront import encode_intra_frame_wavefront

    iout = encode_intra_frame_wavefront(scur, cfg)
    measure_cfg(
        "intra_wavefront",
        # xor with the chained recon's LSB so the loop body consumes its
        # carry (otherwise XLA hoists the intra call out of the chain).
        lambda c, r: encode_intra_frame_wavefront(c ^ (r & 1), cfg)["recon"],
        scur, sref, iters=10,
        extra={"psnr_db": round(float(iout["psnr_db"]), 2)},
    )


def main():
    if os.environ.get("HEVCASM_BENCH_CHILD") == "1":
        measure()
        return

    # Parent: run the measurement in a child with a watchdog + retries.  A
    # timed-out child's partial stdout still counts — the last JSON line
    # (the provisional emit) is used.
    env = dict(os.environ, HEVCASM_BENCH_CHILD="1")
    best_line = None
    for attempt in range(3):
        out = b""
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                timeout=560,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            out = proc.stdout or b""
            rc = proc.returncode
        except subprocess.TimeoutExpired as e:
            out = e.stdout or b""
            rc = "timeout"
            log(f"attempt {attempt}: watchdog timeout (hung transfer?)")
        # Keep the last PARSEABLE line: a child killed mid-print can leave a
        # truncated '{'-prefixed fragment (ADVICE r2).
        lines = []
        for l in out.decode().splitlines():
            if l.startswith("{"):
                try:
                    json.loads(l)
                except ValueError:
                    continue
                lines.append(l)
        if lines:
            best_line = lines[-1]
        if rc == 0 and lines:
            print(best_line)
            return
        log(f"attempt {attempt}: exit {rc}, {len(lines)} json lines")
    if best_line is not None:
        print(best_line)
        return
    log("all attempts failed")
    sys.exit(1)


if __name__ == "__main__":
    main()
