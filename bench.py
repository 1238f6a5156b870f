"""Benchmark entry point for the driver: encodes 1080p inter frames on one
chip and reports CTUs/sec/chip for the SAD(+MC)+transform+quant inner loop —
the BASELINE.json headline metric.

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.

Methodology notes:
* Frames are chained ON DEVICE (lax.fori_loop inside one jit) and a checksum
  of the final reconstruction is fetched, so per-dispatch relay latency
  (~25 ms in this environment) is amortized over the chain AND cannot ACK
  before the work is done.  The empty-chain dispatch floor is measured and
  subtracted — at millisecond frame times it would otherwise add ~25/iters
  ms/frame.
* The measurement runs in a child process with a watchdog: the TPU relay
  occasionally wedges a device->host transfer indefinitely; a hung attempt
  is killed and retried rather than hanging the driver.
"""

import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# v5e bf16 peak; the int8 search matmul runs at 2x this rate, so % figures
# are conservative.
PEAK_FLOPS = 394e12


def measure():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hevcasm_tpu.encode import EncodeConfig
    from hevcasm_tpu.encode.loop import encode_inter_frame

    dev = jax.devices()[0]
    log(f"device: {dev}")

    h, w = 1088, 1920  # 1080p padded to CTU multiple: 17x30 = 510 CTUs
    ctus = (h // 64) * (w // 64)
    cfg = EncodeConfig(search_range=32, qp=32, inter_impl="fused")

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    cur = jnp.asarray(base[2 : 2 + h, 3 : 3 + w])
    ref = jnp.asarray(base[:h, :w])

    t0 = time.perf_counter()
    out = encode_inter_frame(cur, ref, cfg)
    jax.block_until_ready(out)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    psnr = float(out["psnr_db"])

    iters = 100

    def chain_of(body):
        @jax.jit
        def chain(c, r0):
            def f(_, r):
                return body(c, r)

            r = jax.lax.fori_loop(0, iters, f, r0)
            return jnp.sum(r.astype(jnp.uint32))

        return chain

    # Dispatch-floor chain: same structure, trivial body.
    floor_chain = chain_of(lambda c, r: r)
    t0 = time.perf_counter()
    c0 = int(floor_chain(cur, ref))
    frame_chain = chain_of(lambda c, r: encode_inter_frame(c, r, cfg)["recon"])
    c1 = int(frame_chain(cur, ref))
    log(f"chain compile+run: {time.perf_counter() - t0:.1f}s (checksum {c1})")

    t0 = time.perf_counter()
    c0 ^= int(floor_chain(cur, ref))
    floor_s = (time.perf_counter() - t0) / iters

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        c1 ^= int(frame_chain(cur, ref))
        best = min(best, time.perf_counter() - t0)
    frame_s = best / iters - floor_s
    ctus_per_sec = ctus / frame_s

    # Achieved-FLOPs accounting (MXU work actually issued per frame):
    # search 510 x (65*64 x 128 x 128) int8 matmul, refine 510 x (one bf16
    # H pass + two s8 V passes), residual 510 x 16 block-diagonal 64^3
    # passes.
    fl_search = ctus * (65 * 64) * 128 * 128 * 2
    fl_refine = ctus * (128 * 128 * 256 + 2 * 256 * 128 * 256) * 2
    fl_resid = ctus * 16 * 64 ** 3 * 2
    fl = fl_search + fl_refine + fl_resid
    log(
        f"on-device chain x{iters}: {frame_s * 1e3:.2f}ms/frame "
        f"(floor {floor_s * 1e3:.2f}ms subtracted) -> "
        f"{ctus_per_sec:.0f} CTUs/s, {1 / frame_s:.1f} fps 1080p, "
        f"first-frame psnr {psnr:.2f}dB"
    )
    log(
        f"achieved {fl / frame_s / 1e12:.1f} TFLOP/s issued-MXU-work basis "
        f"({fl / frame_s / PEAK_FLOPS * 100:.1f}% of bf16 peak; "
        f"minimal-correlation basis {ctus * 65 * 65 * 64 * 64 * 2 / frame_s / 1e12:.1f} TFLOP/s)"
    )
    print(
        json.dumps(
            {
                "metric": "1080p_ctus_per_sec_per_chip",
                "value": round(ctus_per_sec, 1),
                "unit": "CTU/s",
                "vs_baseline": round(ctus_per_sec / 63432.0, 2),
            }
        )
    )


def main():
    if os.environ.get("HEVCASM_BENCH_CHILD") == "1":
        measure()
        return

    # Parent: run the measurement in a child with a watchdog + one retry.
    env = dict(os.environ, HEVCASM_BENCH_CHILD="1")
    for attempt in range(3):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                timeout=600,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            log(f"attempt {attempt}: watchdog timeout (hung transfer?), retrying")
            continue
        text = proc.stdout.decode()
        lines = [l for l in text.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return
        log(f"attempt {attempt}: exit {proc.returncode}, retrying")
    log("all attempts failed")
    sys.exit(1)


if __name__ == "__main__":
    main()
