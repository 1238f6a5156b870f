"""Scaling-efficiency harness: BASELINE configs 4-5 (frames/s 1 -> N chips).

Config 4: 1080p 8-frame IPPP GOP, frames data-parallel over the 'frames'
mesh axis (open loop: P frames depend only on sources, so the GOP is
embarrassingly parallel and the scaling bar is >=80% efficiency).

Config 5: 4K 32-frame closed-loop GOP, each frame's CTU-row bands sharded
over the 'rows' axis with ppermute halo exchange (the frame chain itself is
sequential by construction — conforming encoders reference reconstructions).

Methodology (ready for real multi-chip hardware; in this container only one
TPU chip is reachable, so the default run uses the N-virtual-device CPU
backend to validate the sharded programs end-to-end and measure program-level
overhead):

  * encode the same GOP on a 1-device mesh and an N-device mesh,
  * wall-time the jitted program over --reps repetitions (first run
    discarded: compile), fetching a checksum so nothing is overlapped away,
  * frames/s = (T-1) / wall;  efficiency = t_1 / (N * t_N).

Emits one JSON line per config.  --scale full uses the faithful BASELINE
shapes (1088x1920 / 2176x3840, +-32); the default --scale dryrun shrinks
the spatial size and search range so the CPU run finishes in minutes while
exercising the identical program structure.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--configs", default="4,5")
    ap.add_argument("--scale", choices=("dryrun", "full"), default="dryrun")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", choices=("cpu", "auto"), default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    import numpy as np

    from hevcasm_tpu.encode import EncodeConfig
    from hevcasm_tpu.parallel import (
        encode_gop_closed_loop_spatial,
        encode_gop_data_parallel,
        make_mesh,
    )

    n = args.devices
    assert len(jax.devices()) >= n, f"need {n} devices"
    platform = jax.devices()[0].platform

    def timed(fn, reps):
        out = fn()
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            # fetch a real value so the measurement covers the execution
            _ = int(jnp.sum(out["recon"][..., :1, :1].astype(jnp.uint32)))
            best = min(best, time.perf_counter() - t0)
        return best

    rng = np.random.default_rng(0)

    def clip(t, h, w):
        base = rng.integers(0, 256, (h + 2 * t, w + 2 * t), dtype=np.uint8)
        return jnp.asarray(
            np.stack([base[i : i + h, 2 * i : 2 * i + w] for i in range(t)])
        )

    results = []
    configs = [c.strip() for c in args.configs.split(",")]

    if "4" in configs:
        if args.scale == "full":
            t, h, w, r = 1 + n, 1088, 1920, 32
        else:
            t, h, w, r = 1 + n, 256, 384, 8
        cfg = EncodeConfig(search_range=r, qp=32)
        frames = clip(t, h, w)
        mesh1 = make_mesh(frames=1, rows=1, devices=jax.devices()[:1])
        meshn = make_mesh(frames=n, rows=1)
        t1 = timed(lambda: encode_gop_data_parallel(frames, mesh1, cfg), args.reps)
        tn = timed(lambda: encode_gop_data_parallel(frames, meshn, cfg), args.reps)
        eff = t1 / (tn * n) if tn > 0 else 0.0
        results.append({
            "config": 4, "desc": f"{h}x{w} {t}-frame GOP dp over {n} devices",
            "platform": platform, "scale": args.scale,
            "fps_1dev": round((t - 1) / t1, 3), "fps_ndev": round((t - 1) / tn, 3),
            "scaling_efficiency": round(eff, 3),
        })

    if "5" in configs:
        if args.scale == "full":
            t, h, w, r, rows = 32, 2176, 3840, 32, n
        else:
            t, h, w, r, rows = 6, 256 * (n // 2), 384, 8, n // 2
        cfg = EncodeConfig(search_range=r, qp=32)
        frames = clip(t, h, w)
        mesh1 = make_mesh(frames=1, rows=1, devices=jax.devices()[:1])
        meshn = make_mesh(frames=1, rows=rows, devices=jax.devices()[:rows])
        t1 = timed(lambda: encode_gop_closed_loop_spatial(frames, mesh1, cfg), args.reps)
        tn = timed(lambda: encode_gop_closed_loop_spatial(frames, meshn, cfg), args.reps)
        eff = t1 / (tn * rows) if tn > 0 else 0.0
        results.append({
            "config": 5, "desc": f"{h}x{w} {t}-frame closed-loop GOP, {rows}-way spatial",
            "platform": platform, "scale": args.scale,
            "fps_1dev": round((t - 1) / t1, 3), "fps_ndev": round((t - 1) / tn, 3),
            "scaling_efficiency": round(eff, 3),
        })

    for r_ in results:
        print(json.dumps(r_), flush=True)
    if not results:
        print(json.dumps({"error": "no configs selected"}))
        sys.exit(1)


if __name__ == "__main__":
    main()
