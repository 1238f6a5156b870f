"""Closed-loop wavefront intra must equal a sequential raster-order encode
(same ops, strict dependency order) bit-exactly — verifying that the WPP
wave schedule respects every left/above/above-right dependency."""

import numpy as np
import jax.numpy as jnp

from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode.loop import (_intra_mode_decide, _prepare_intra_refs,
    _residual_pipeline)
from hevcasm_tpu.encode.intra_wavefront import encode_intra_frame_wavefront, UNAVAILABLE


def _raster_reference(cur, cfg):
    h, w = cur.shape
    n = cfg.intra_block
    gr, gc = h // n, w // n
    canvas = np.full((1 + h + n, 1 + w + 2 * n), UNAVAILABLE, np.uint8)
    nnz_total = 0
    for r in range(gr):
        for c in range(gc):
            y0, x0 = 1 + r * n, 1 + c * n
            above = jnp.asarray(canvas[y0 - 1, x0 : x0 + 2 * n])[None]
            left = jnp.asarray(canvas[y0 : y0 + 2 * n, x0 - 1])[None]
            corner = jnp.asarray(canvas[y0 - 1, x0 - 1])[None]
            src = jnp.asarray(cur[r * n : (r + 1) * n, c * n : (c + 1) * n])

            ii = np.arange(2 * n)
            lav = jnp.asarray(((c > 0) & (r * n + ii < h) & (ii < n))[None])
            aav = jnp.asarray(((r > 0) & (c * n + ii < w))[None])
            cav = jnp.asarray(np.array([(c > 0) & (r > 0)]))
            plain, filt = _prepare_intra_refs(
                left, above, corner, lav, aav, cav, n, cfg)

            # Mode decision through the SAME helper the wavefront uses
            # (this oracle verifies the DEPENDENCY ORDER, not the metric;
            # the metric itself is covered by tests/test_pred_intra.py).
            pred, _ = _intra_mode_decide(src[None], plain, filt, n)
            pred = pred[0]

            rec, nnz, _ = _residual_pipeline(src[None], pred[None], cfg, intra=True)
            canvas[y0 : y0 + n, x0 : x0 + n] = np.asarray(rec[0])
            nnz_total += int(nnz)
    return canvas[1 : 1 + h, 1 : 1 + w], nnz_total


def test_wavefront_matches_raster(rng):
    cfg = EncodeConfig(qp=30, intra_block=32)
    base = rng.integers(0, 256, (64, 96)).astype(np.float32)
    for _ in range(2):
        base = (np.roll(base, 1, 0) + base + np.roll(base, -1, 0)) / 3
        base = (np.roll(base, 1, 1) + base + np.roll(base, -1, 1)) / 3
    cur = np.clip(base, 0, 255).astype(np.uint8)

    got = encode_intra_frame_wavefront(jnp.asarray(cur), cfg)
    want_recon, want_nnz = _raster_reference(cur, cfg)
    np.testing.assert_array_equal(np.asarray(got["recon"]), want_recon)
    assert int(got["nnz"]) == want_nnz


def test_wavefront_quality(rng):
    """Closed-loop intra at moderate qp on smooth content."""
    cfg = EncodeConfig(qp=27, intra_block=32)
    base = rng.integers(0, 256, (128, 128)).astype(np.float32)
    for _ in range(2):
        base = (np.roll(base, 1, 0) + base + np.roll(base, -1, 0)) / 3
        base = (np.roll(base, 1, 1) + base + np.roll(base, -1, 1)) / 3
    cur = np.clip(base, 0, 255).astype(np.uint8)
    out = encode_intra_frame_wavefront(jnp.asarray(cur), cfg)
    assert float(out["psnr_db"]) > 33.0
