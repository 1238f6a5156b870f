"""Capture an XLA profiler trace of the composed 1080p fused_dma frame.

Writes a trace to /tmp/hevcasm_trace; summarize with
tools/trace_summary.py (reads the .xplane.pb) or inspect op names/timings
to attribute the gap between the composed frame time and the stage sum.

Diagnostics only; run on TPU:  python tools/trace_frame.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode.loop import encode_inter_frame


def main():
    h, w = 1088, 1920
    cfg = EncodeConfig(search_range=32, qp=32, inter_impl="fused_dma")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    cur = jnp.asarray(base[2 : 2 + h, 3 : 3 + w])
    ref = jnp.asarray(base[:h, :w])

    @jax.jit
    def chain(c, r0):
        def f(_, r):
            return encode_inter_frame(c, r, cfg)["recon"]
        r = jax.lax.fori_loop(0, 20, f, r0)
        return jnp.sum(r.astype(jnp.uint32))

    int(chain(cur, ref))  # compile + warm
    with jax.profiler.trace("/tmp/hevcasm_trace"):
        int(chain(cur, ref))
    print("trace written to /tmp/hevcasm_trace", flush=True)


if __name__ == "__main__":
    main()
