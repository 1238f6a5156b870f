"""Timing / roofline utilities: the TPU analogue of the reference's rdtsc
cycle counting (hevcasm.h:52-58) and converging averager
(hevcasm_test.c:40-107).

On TPU there is no rdtsc; we time jitted callables wall-clock with
block_until_ready after a compile+warmup call, using best-of-k which plays
the same role as the reference's restart-if-faster-sample convergence loop.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def time_fn(fn: Callable, *args, iters: int = 10, inner: int = 1, warmup: int = 2):
    """Best-of-``iters`` wall time of ``fn(*args)`` in seconds.

    inner > 1 amortises dispatch overhead by timing ``inner`` sequential
    calls (the role of hevcasm_test.c's f(bound, 4) batching at :53-55).
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / inner
        best = min(best, dt)
    return best


def gbps(num_bytes: int, seconds: float) -> float:
    return num_bytes / seconds / 1e9


def gops(num_ops: int, seconds: float) -> float:
    return num_ops / seconds / 1e9
