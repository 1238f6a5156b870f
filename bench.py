"""Benchmark entry point for the driver: encodes 1080p inter frames on one
chip and reports CTUs/sec/chip for the SAD(+MC)+transform+quant inner loop —
the BASELINE.json headline metric.

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.

The measurement runs in a child process with a watchdog: the TPU relay in
this environment occasionally wedges a device->host transfer indefinitely,
so a hung attempt is killed and retried rather than hanging the driver.
"""

import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    cfg = EncodeConfig(search_range=32, qp=32)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    cur = jnp.asarray(base[2 : 2 + h, 3 : 3 + w])
    ref = jnp.asarray(base[:h, :w])

    def step(cur, ref):
        return encode_inter_frame(cur, ref, cfg)

    t0 = time.perf_counter()
    out = step(cur, ref)
    jax.block_until_ready(out)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    # Chain recon -> next ref ON DEVICE (lax.fori_loop inside one jit), then
    # fetch a checksum of the final reconstruction.  One dispatch + one small
    # value transfer: per-dispatch relay overhead cannot pollute the figure,
    # and the checksum cannot arrive before the chain has truly executed.
    iters = 32

    @jax.jit
    def chain(cur, ref):
        def body(_, r):
            return encode_inter_frame(cur, r, cfg)["recon"]

        r = jax.lax.fori_loop(0, iters, body, ref)
        return jnp.sum(r.astype(jnp.uint32))

    t0 = time.perf_counter()
    c = int(chain(cur, ref))  # includes chain compile
    log(f"chain compile+run: {time.perf_counter() - t0:.1f}s (checksum {c})")
    t0 = time.perf_counter()
    c = int(chain(cur, ref))
    frame_s = (time.perf_counter() - t0) / iters
    ctus_per_sec = ctus / frame_s
    psnr = float(out["psnr_db"])
    log(
        f"on-device chain x{iters}: {frame_s * 1e3:.2f}ms/frame -> "
        f"{ctus_per_sec:.0f} CTUs/s, {1 / frame_s:.1f} fps 1080p, "
        f"first-frame psnr {psnr:.2f}dB"
    )
    print(
        json.dumps(
            {
                "metric": "1080p_ctus_per_sec_per_chip",
                "value": round(ctus_per_sec, 1),
                "unit": "CTU/s",
                "vs_baseline": 1.0,
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
