"""Cost/benefit of the variable-block-structure modes at 1080p on the
current backend: frame time and PSNR for fixed-PU/TU vs per-CTU PU decision
vs per-CTU TU selection.  Diagnostics only (the driver bench stays on the
fixed fast path; this tool quantifies what the decisions buy)."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hevcasm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from hevcasm_tpu.encode import EncodeConfig
    from hevcasm_tpu.encode.loop import encode_inter_frame

    h, w = 1088, 1920
    rng = np.random.default_rng(0)
    # Panning content with a divergent-motion band so sub-CTU PUs matter.
    base = rng.integers(0, 256, (h + 128, w + 128), dtype=np.uint8)
    smooth = base.astype(np.float32)
    for _ in range(2):
        smooth = (np.roll(smooth, 1, 0) + smooth + np.roll(smooth, -1, 0)) / 3
        smooth = (np.roll(smooth, 1, 1) + smooth + np.roll(smooth, -1, 1)) / 3
    base = np.clip(smooth, 0, 255).astype(np.uint8)
    ref = base[32 : 32 + h, 32 : 32 + w]
    cur = np.empty_like(ref)
    cur[: h // 2] = base[32 + 3 : 32 + 3 + h // 2, 32 + 2 : 32 + 2 + w]
    cur[h // 2 :] = base[32 - 5 + h // 2 : 32 - 5 + h, 32 - 7 : 32 - 7 + w]
    cur, ref = jnp.asarray(cur), jnp.asarray(ref)

    def timed(cfg, iters=20, reps=2):
        @jax.jit
        def chain(c, r0):
            def f(i, acc):
                out = encode_inter_frame(c, r0 + (i % 2).astype(r0.dtype), cfg)
                return acc + jnp.sum(out["recon"][0].astype(jnp.uint32))
            return jax.lax.fori_loop(0, iters, f, jnp.uint32(0))

        x = int(chain(cur, ref))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            x ^= int(chain(cur, ref))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    @jax.jit
    def floor_chain(c, r0):
        def f(i, acc):
            return acc + (c[0, 0] + i).astype(jnp.uint32)
        return jax.lax.fori_loop(0, 20, f, jnp.uint32(0))
    int(floor_chain(cur, ref))
    t0 = time.perf_counter(); int(floor_chain(cur, ref))
    floor = (time.perf_counter() - t0) / 20

    all_layouts = ("2Nx2N", "2NxN", "Nx2N", "NxN", "quarter", "eighth")
    variants = {
        "fixed (fused_dma)": EncodeConfig(search_range=32, qp=32, inter_impl="fused_dma"),
        "pu_decision": EncodeConfig(search_range=32, qp=32, pu_decision=True),
        "pu_amp+8x8": EncodeConfig(search_range=32, qp=32, pu_decision=True,
                                   pu_layouts=all_layouts),
        "tu_select": EncodeConfig(search_range=32, qp=32, tu_sizes=(4, 8, 16, 32)),
        "pu+tu": EncodeConfig(search_range=32, qp=32, pu_decision=True,
                              tu_sizes=(4, 8, 16, 32)),
    }
    for name, cfg in variants.items():
        try:
            out = encode_inter_frame(cur, ref, cfg)
            p = float(out["psnr_db"])
            t = timed(cfg) - floor
            extra = ""
            if "pu_layout" in out:
                lv = np.asarray(out["pu_layout"])
                extra = "  layouts " + "/".join(cfg.pu_layouts) + ": " + "/".join(
                    str(int(np.sum(lv == k))) for k in range(len(cfg.pu_layouts)))
            if "tu_choice" in out:
                ch = np.asarray(out["tu_choice"])
                extra += "  tu counts: " + "/".join(
                    str(int(np.sum(ch == k))) for k in range(4))
            print(f"{name:18s} {t*1e3:7.2f} ms/frame  psnr {p:6.2f} dB{extra}",
                  flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
