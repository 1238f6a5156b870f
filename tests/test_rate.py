"""Rate control: traced-qp quantizer params match the static path; the
controller steers bits toward the target."""

import numpy as np
import jax.numpy as jnp
import pytest

from hevcasm_tpu.encode import EncodeConfig
from hevcasm_tpu.encode.loop import encode_inter_frame
from hevcasm_tpu.encode.rate import (
    quant_params_traced,
    bits_estimate,
    encode_inter_frame_traced_qp,
    encode_gop_rate_controlled,
)


def test_traced_params_match_static():
    for qp in (4, 22, 32, 45, 51):
        cfg = EncodeConfig(qp=qp)
        qs, qh, qo = cfg.quant_params(False)
        ds, dh = cfg.dequant_params()
        tqs, tqh, tqo, tds, tdh = quant_params_traced(jnp.int32(qp), cfg.tu_log2)
        assert (int(tqs), int(tqh), tqo, int(tds), int(tdh)) == (qs, qh, qo, ds, dh)


def test_bits_estimate():
    levels = np.array([0, 1, -1, 2, 3, -4, 100], dtype=np.int16)
    # bits: 0, 3, 3, 5, 5, 7, 2*6+3=15
    assert int(bits_estimate(jnp.asarray(levels))) == 3 + 3 + 5 + 5 + 7 + 15


def _clip(rng, t, h, w, noise=0):
    base = rng.integers(0, 256, (h + 4 * t, w + 4 * t)).astype(np.float32)
    for _ in range(2):
        base = (np.roll(base, 1, 0) + base + np.roll(base, -1, 0)) / 3
        base = (np.roll(base, 1, 1) + base + np.roll(base, -1, 1)) / 3
    base = np.clip(base, 0, 255).astype(np.uint8)
    out = np.stack([base[2 * i : 2 * i + h, 3 * i : 3 * i + w] for i in range(t)])
    if noise:
        # per-frame independent noise so residuals never quantize to zero
        n = rng.integers(-noise, noise + 1, out.shape)
        out = np.clip(out.astype(np.int16) + n, 0, 255).astype(np.uint8)
    return out


def test_traced_qp_frame_matches_static(rng):
    frames = _clip(rng, 2, 128, 128)
    cfg = EncodeConfig(search_range=8, qp=30)
    static = encode_inter_frame(jnp.asarray(frames[1]), jnp.asarray(frames[0]), cfg)
    traced = encode_inter_frame_traced_qp(
        jnp.asarray(frames[1]), jnp.asarray(frames[0]), jnp.int32(30), cfg
    )
    np.testing.assert_array_equal(np.asarray(static["recon"]), np.asarray(traced["recon"]))


def test_rate_control_steers_bits(rng):
    frames = _clip(rng, 8, 128, 128, noise=12)
    cfg = EncodeConfig(search_range=8)
    # Pick a target between two mid qps so the controller must move qp.
    lo = encode_inter_frame_traced_qp(
        jnp.asarray(frames[1]), jnp.asarray(frames[0]), jnp.int32(38), cfg
    )["bits"]
    hi = encode_inter_frame_traced_qp(
        jnp.asarray(frames[1]), jnp.asarray(frames[0]), jnp.int32(22), cfg
    )["bits"]
    target = int(np.sqrt(max(int(lo), 1) * max(int(hi), 1)))
    out = encode_gop_rate_controlled(jnp.asarray(frames), target, 40, cfg)
    bits = np.asarray(out["bits"]).astype(float)
    qps = np.asarray(out["qp"])
    # After settling, frames should land within ~an octave of the target.
    settled = bits[3:]
    assert np.all(settled > target / 2.5) and np.all(settled < target * 2.5), (bits, qps, target)
    # and qp must actually have moved from the start value
    assert qps[0] == 40 and qps[-1] != 40
