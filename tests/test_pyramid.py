"""Hierarchical (pyramid) motion search: finds planted motion across the
same +-R window as full search, and the encode loop accepts the strategy."""

import numpy as np
import jax.numpy as jnp

from hevcasm_tpu.encode import ctu as ctu_mod
from hevcasm_tpu.encode import motion
from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode.loop import encode_inter_frame


def test_pyramid_finds_planted_motion(rng):
    h, w, r = 128, 128, 16
    m = r + motion.PAD_R
    base = rng.integers(0, 256, (h + 2 * m, w + 2 * m), dtype=np.uint8)
    dy, dx = 6, -9
    cur = base[m + dy : m + dy + h, m + dx : m + dx + w]
    ref = base[m : m + h, m : m + w]
    ref_padded = base[
        m - r - motion.PAD_L : m + h + r + motion.PAD_R,
        m - r - motion.PAD_L : m + w + r + motion.PAD_R,
    ]
    src = ctu_mod.tile_frame(jnp.asarray(cur), 64)
    pos = motion.ctu_positions(2, 2, 64)
    mv, score = motion.pyramid_search(
        src, jnp.asarray(ref), jnp.asarray(ref_padded), pos, r
    )
    np.testing.assert_array_equal(np.asarray(score), np.zeros(4, np.int32))
    np.testing.assert_array_equal(np.asarray(mv), np.tile([dy, dx], (4, 1)))


def test_pyramid_encode_quality(rng):
    """Pyramid strategy must stay within a small PSNR delta of full search."""
    base = rng.integers(0, 256, (160, 160)).astype(np.float32)
    for _ in range(2):
        base = (np.roll(base, 1, 0) + base + np.roll(base, -1, 0)) / 3
        base = (np.roll(base, 1, 1) + base + np.roll(base, -1, 1)) / 3
    base = np.clip(base, 0, 255).astype(np.uint8)
    ref = base[:128, :128]
    cur = base[5:133, 7:135]
    full = encode_inter_frame(
        jnp.asarray(cur), jnp.asarray(ref), EncodeConfig(search_range=16, qp=27)
    )
    pyr = encode_inter_frame(
        jnp.asarray(cur), jnp.asarray(ref),
        EncodeConfig(search_range=16, qp=27, me_strategy="pyramid"),
    )
    assert float(pyr["psnr_db"]) > float(full["psnr_db"]) - 0.5
