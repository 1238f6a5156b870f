"""Fused Pallas residual-pipeline kernel vs the composed REF ops,
bit-exact (interpreter mode on CPU)."""

import numpy as np
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
