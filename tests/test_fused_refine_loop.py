"""encode_inter_frame with cfg.fused_refine must be bit-identical to the
default path."""

import numpy as np
import jax.numpy as jnp

from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode.loop import encode_inter_frame


def test_fused_refine_bit_identical(rng):
    base = rng.integers(0, 256, (160, 160)).astype(np.float32)
    for _ in range(2):
        base = (np.roll(base, 1, 0) + base + np.roll(base, -1, 0)) / 3
        base = (np.roll(base, 1, 1) + base + np.roll(base, -1, 1)) / 3
    base = np.clip(base, 0, 255).astype(np.uint8)
    cur, ref = base[5:133, 7:135], base[:128, :128]
    a = encode_inter_frame(jnp.asarray(cur), jnp.asarray(ref), EncodeConfig(search_range=8, qp=30))
    b = encode_inter_frame(
        jnp.asarray(cur), jnp.asarray(ref), EncodeConfig(search_range=8, qp=30, fused_refine=True)
    )
    np.testing.assert_array_equal(np.asarray(a["recon"]), np.asarray(b["recon"]))
    np.testing.assert_array_equal(np.asarray(a["mvs"]), np.asarray(b["mvs"]))
