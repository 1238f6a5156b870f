"""Pallas MC kernels (pred_uni / pred_bi at given fractions) vs the REF
ops, bit-exact, incl. traced per-block fractions (interpret mode off-TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hevcasm_tpu.kernels.mc_pallas import pred_uni_pallas, pred_bi_pallas
from hevcasm_tpu.ops.pred_inter import pred_uni, pred_bi


@pytest.mark.parametrize("wh", [(64, 64), (32, 16), (16, 16), (8, 4)])
def test_pred_uni_pallas_matches_ref(rng, wh):
    w, h = wh
    win = rng.integers(0, 256, (3, h + 7, w + 7), dtype=np.uint8)
    for (xf, yf) in [(0, 0), (1, 0), (0, 1), (2, 3)]:
        got = np.asarray(pred_uni_pallas(jnp.asarray(win), xf, yf))
        want = np.asarray(pred_uni(jnp.asarray(win), xf, yf))
        np.testing.assert_array_equal(got, want, err_msg=f"{wh} ({xf},{yf})")


def test_pred_uni_pallas_traced_fracs(rng):
    win = rng.integers(0, 256, (5, 39, 39), dtype=np.uint8)
    xfs = jnp.asarray(rng.integers(0, 4, (5,), dtype=np.int32))
    yfs = jnp.asarray(rng.integers(0, 4, (5,), dtype=np.int32))
    got = np.asarray(pred_uni_pallas(jnp.asarray(win), xfs, yfs))
    want = np.asarray(pred_uni(jnp.asarray(win), xfs, yfs))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("wh", [(32, 32), (16, 8), (4, 2)])
def test_pred_uni_pallas_chroma_4tap(rng, wh):
    """4-tap chroma eighth-pel family, all 8 phases reachable."""
    w, h = wh
    win = rng.integers(0, 256, (3, h + 3, w + 3), dtype=np.uint8)
    for (xf, yf) in [(0, 0), (1, 0), (0, 7), (5, 3)]:
        got = np.asarray(pred_uni_pallas(jnp.asarray(win), xf, yf, taps=4))
        want = np.asarray(pred_uni(jnp.asarray(win), xf, yf, taps=4))
        np.testing.assert_array_equal(got, want, err_msg=f"{wh} ({xf},{yf})")


def test_pred_bi_pallas_chroma_4tap(rng):
    w0 = rng.integers(0, 256, (2, 19, 19), dtype=np.uint8)
    w1 = rng.integers(0, 256, (2, 19, 19), dtype=np.uint8)
    got = np.asarray(pred_bi_pallas(jnp.asarray(w0), jnp.asarray(w1),
                                    1, 6, 3, 2, taps=4))
    want = np.asarray(pred_bi(jnp.asarray(w0), jnp.asarray(w1),
                              1, 6, 3, 2, taps=4))
    np.testing.assert_array_equal(got, want)


def test_pred_bi_pallas_matches_ref(rng):
    w0 = rng.integers(0, 256, (2, 39, 39), dtype=np.uint8)
    w1 = rng.integers(0, 256, (2, 39, 39), dtype=np.uint8)
    for fr in [(0, 0, 0, 0), (1, 2, 3, 1)]:
        got = np.asarray(pred_bi_pallas(jnp.asarray(w0), jnp.asarray(w1), *fr))
        want = np.asarray(pred_bi(jnp.asarray(w0), jnp.asarray(w1), *fr))
        np.testing.assert_array_equal(got, want, err_msg=str(fr))


def test_registry_has_pallas_mc_tier():
    from hevcasm_tpu import registry
    from hevcasm_tpu.config import Tier

    assert registry.get_tier("pred_uni", Tier.PALLAS) is not None
    assert registry.get_tier("pred_bi", Tier.PALLAS) is not None
