"""Compare full-search SSD-grid formulations on the current backend.

Candidates: the XLA scan formulation (kernels/xla_opt.ssd_grid) and the
Pallas rolled-source kernel (kernels/search_pallas.ssd_grid) with its
strategy variants.  All must be bit-exact integer SSD; this tool times them
at the bench shape (510 CTUs, +-32) and checks cross-agreement.

Timing methodology: each candidate runs inside an on-device fori_loop chain
(one dispatch per measurement), and the per-dispatch relay latency — ~25 ms
in this environment, measured with an empty-body chain — is amortized over
`iters` AND subtracted, because at millisecond kernel scales it otherwise
dominates the reading.

Diagnostics only.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

PEAK_FLOPS = 394e12  # v5e bf16; int8 is ~2x


def make_timer(src, win, iters=100, reps=3):
    import jax
    import jax.numpy as jnp

    def timed(fn):
        @jax.jit
        def chain(x0, w):
            def body(i, acc):
                x = x0 + (i % 2).astype(x0.dtype)
                return acc + jnp.sum(fn(x, w).astype(jnp.int32)) % 65536
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        c = int(chain(src, win))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            c ^= int(chain(src, win))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    floor = timed(lambda x, w: x[:1, :1, :1])
    return timed, floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=510)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--range", type=int, default=32, dest="srange")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax

    from hevcasm_tpu.kernels import xla_opt, search_pallas

    print(f"backend: {jax.default_backend()}", flush=True)

    n, b, r = args.n, args.b, args.srange
    num = 2 * r + 1
    size = b + 2 * r
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
    win = jnp.asarray(rng.integers(0, 256, (n, size, size), dtype=np.uint8))

    flops = 2 * n * num * num * b * b  # minimal corr MACs x2

    ref = np.asarray(xla_opt.ssd_grid(src, win, num, num))
    timed, floor = make_timer(src, win, iters=args.iters)
    print(f"dispatch floor: {floor*args.iters*1e3:.1f} ms/dispatch", flush=True)

    cands = {
        "pallas": functools.partial(search_pallas.ssd_grid, num_dy=num, num_dx=num),
        "pallas_bf16": functools.partial(
            search_pallas.ssd_grid, num_dy=num, num_dx=num, mm="bf16"),
        "pallas_rolls": functools.partial(
            search_pallas.ssd_grid, num_dy=num, num_dx=num, band="rolls"),
        "xla_scan": functools.partial(xla_opt.ssd_grid, num_dy=num, num_dx=num),
    }
    for name, fn in cands.items():
        try:
            out = np.asarray(fn(src, win))
            ok = np.array_equal(out, ref)
            t = timed(fn) - floor
            print(f"{name:16s} {t*1e3:8.3f} ms  {flops/t/1e12:7.2f} TFLOP/s "
                  f"({flops/t/PEAK_FLOPS*100:5.1f}% of bf16 peak, minimal-FLOPs basis)  "
                  f"exact={ok}", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
