"""Fused Pallas quarter-pel refinement vs the jnp path, bit-exact including
argmin tie-breaking."""

import numpy as np
import jax.numpy as jnp

from hevcasm_tpu.encode import ctu as ctu_mod
from hevcasm_tpu.encode import motion
from hevcasm_tpu.kernels.interp_pallas import refine_quarter_pel_fused


def test_fused_refine_matches(rng):
    n, b, r = 4, 64, 4
    src = rng.integers(0, 256, (n, b, b), dtype=np.uint8)
    plane = rng.integers(0, 256, (2 * b + 2 * r + 8, 2 * b + 2 * r + 8), dtype=np.uint8)

    pos = motion.ctu_positions(2, 2, b)
    ref_padded = jnp.asarray(plane)
    mv = jnp.asarray(rng.integers(-r, r + 1, (n, 2)), jnp.int32)

    want_pred, want_mvq, win = motion.refine_quarter_pel(
        jnp.asarray(src), ref_padded, pos, mv, r
    )
    got_pred, got_frac, got_cost = refine_quarter_pel_fused(jnp.asarray(src), win)

    np.testing.assert_array_equal(np.asarray(got_pred), np.asarray(want_pred))
    want_frac = np.asarray(want_mvq - mv * 4)  # (n, 2) [yf, xf]
    got = np.asarray(got_frac)
    np.testing.assert_array_equal(got // 4, want_frac[:, 0])
    np.testing.assert_array_equal(got % 4, want_frac[:, 1])


def test_costmap_pallas_matches_mxu(rng):
    """Pallas cost-map kernel == the MXU 16-candidate sweep's costs."""
    from hevcasm_tpu.kernels.interp_pallas import refine_qpel_costmap
    from hevcasm_tpu.kernels.interp_xla import refine_qpel_costmap_mxu

    for b in (16, 32, 64):
        n = 5
        src = rng.integers(0, 256, (n, b, b), dtype=np.uint8)
        win = rng.integers(0, 256, (n, b + 7, b + 7), dtype=np.uint8)
        got = np.asarray(refine_qpel_costmap(jnp.asarray(src), jnp.asarray(win)))
        _, want = refine_qpel_costmap_mxu(jnp.asarray(src), jnp.asarray(win))
        np.testing.assert_array_equal(got.reshape(n, 16), np.asarray(want)), b
