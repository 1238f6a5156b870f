"""Fused Pallas residual-pipeline kernel vs the composed REF ops,
bit-exact (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode.loop import _residual_pipeline
from hevcasm_tpu.kernels.residual_pallas import residual_pipeline_ctu


def test_fused_residual_matches_ref(rng):
    cfg = EncodeConfig(qp=32)
    n = 3
    src = rng.integers(0, 256, (n, 64, 64), dtype=np.uint8)
    pred = rng.integers(0, 256, (n, 64, 64), dtype=np.uint8)

    want_rec, want_nnz, _ = _residual_pipeline(
        jnp.asarray(src), jnp.asarray(pred), cfg, intra=False
    )

    qscale, qshift, qoffset = cfg.quant_params(False)
    dscale, dshift = cfg.dequant_params()
    got_rec, got_nnz = residual_pipeline_ctu(
        jnp.asarray(src), jnp.asarray(pred), qscale, qshift, qoffset, dscale, dshift
    )
    np.testing.assert_array_equal(np.asarray(got_rec), np.asarray(want_rec))
    assert int(jnp.sum(got_nnz)) == int(want_nnz)


def test_fused_residual_multiple_qps(rng):
    src = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    pred = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    for qp in (4, 27, 45):
        cfg = EncodeConfig(qp=qp)
        want_rec, _, _ = _residual_pipeline(jnp.asarray(src), jnp.asarray(pred), cfg, intra=False)
        qs, qh, qo = cfg.quant_params(False)
        ds, dh = cfg.dequant_params()
        got_rec, _ = residual_pipeline_ctu(jnp.asarray(src), jnp.asarray(pred), qs, qh, qo, ds, dh)
        np.testing.assert_array_equal(np.asarray(got_rec), np.asarray(want_rec), err_msg=f"qp={qp}")


@pytest.mark.parametrize("tu", [4, 8, 16, 32])
def test_residual_pipeline_ctu_tu_sizes(rng, tu):
    """The block-diagonal fused kernel generalizes to every TU size,
    bit-exact with the composed REF ops (VERDICT r2 #3: TU-size variants
    of the block-diagonal kernel)."""
    import dataclasses

    from hevcasm_tpu.encode import EncodeConfig
    from hevcasm_tpu.kernels.residual_pallas import residual_pipeline_ctu
    from hevcasm_tpu.ops.residual import residual_pipeline

    cfg = dataclasses.replace(EncodeConfig(), tu=tu)
    scale, shift, offset = cfg.quant_params(False)
    dscale, dshift = cfg.dequant_params()
    n = 3
    src = rng.integers(0, 256, (n, 64, 64), dtype=np.uint8)
    pred = rng.integers(0, 256, (n, 64, 64), dtype=np.uint8)
    rec, nnz_tu = residual_pipeline_ctu(
        jnp.asarray(src), jnp.asarray(pred), scale, shift, offset,
        dscale, dshift, tu=tu)
    want_rec, want_nnz, want_cbf = residual_pipeline(
        jnp.asarray(src), jnp.asarray(pred), scale, shift, offset,
        dscale, dshift, tu=tu, tr_type=0)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want_rec))
    assert int(jnp.sum(nnz_tu)) == int(want_nnz)
    np.testing.assert_array_equal(
        np.asarray((nnz_tu > 0).reshape(-1)), np.asarray(want_cbf))


def test_residual_pipeline_ctu_dst4(rng):
    """tr_type=1 (4x4 DST-VII, intra luma) through the fused kernel."""
    import dataclasses

    from hevcasm_tpu.encode import EncodeConfig
    from hevcasm_tpu.kernels.residual_pallas import residual_pipeline_ctu
    from hevcasm_tpu.ops.residual import residual_pipeline

    cfg = dataclasses.replace(EncodeConfig(), tu=4)
    scale, shift, offset = cfg.quant_params(True)
    dscale, dshift = cfg.dequant_params()
    src = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    pred = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    rec, nnz_tu = residual_pipeline_ctu(
        jnp.asarray(src), jnp.asarray(pred), scale, shift, offset,
        dscale, dshift, tu=4, tr_type=1)
    want_rec, want_nnz, _ = residual_pipeline(
        jnp.asarray(src), jnp.asarray(pred), scale, shift, offset,
        dscale, dshift, tu=4, tr_type=1)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want_rec))
    assert int(jnp.sum(nnz_tu)) == int(want_nnz)
