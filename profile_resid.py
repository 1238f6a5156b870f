"""Bisect residual_pipeline_frame cost on TPU: time prefixes of the pipeline."""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from hevcasm_tpu.ops import transform as tr
from hevcasm_tpu.kernels.xla_opt import _mm_left_exact, _mm_right_exact

n, b, tu = 510, 64, 8
k = b // tu
rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
pred = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
bd_np = np.kron(np.eye(k, dtype=np.int64), tr.dct_matrix(tu))
bd = jnp.asarray(bd_np).astype(jnp.bfloat16)
s1, s2 = tr.forward_shifts(3)
i1, i2 = tr.INVERSE_SHIFTS
qscale, qshift, qoffset, dscale, dshift = 16384, 23, 85 << 7, 2048, 2

ITERS = 32


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.3f} ms")


def wrap16(x):
    return x.astype(jnp.int16).astype(jnp.int32)


def upto(stage):
    def fn(src, pred):
        res = src.astype(jnp.int32) - pred.astype(jnp.int32)
        if stage == "res":
            return res
        a1 = jnp.einsum("nij,kj->nik", res.astype(jnp.bfloat16), bd,
                        preferred_element_type=jnp.float32).astype(jnp.int32)
        if stage == "a1":
            return a1
        st1 = wrap16((a1 + (1 << (s1 - 1))) >> s1)
        coeffs = wrap16((_mm_left_exact(bd, st1) + (1 << (s2 - 1))) >> s2)
        if stage == "coeffs":
            return coeffs
        sign = jnp.where(coeffs < 0, -1, 1)
        q = ((jnp.abs(coeffs) * qscale + (qoffset << (qshift - 16))) >> qshift) * sign
        q = jnp.clip(q, -32768, 32767)
        if stage == "q":
            return q
        dq = jnp.clip((q * dscale + (1 << (dshift - 1))) >> dshift, -32768, 32767)
        r1 = jnp.clip((_mm_left_exact(bd.T, dq) + (1 << (i1 - 1))) >> i1, -32768, 32767)
        if stage == "r1":
            return r1
        r2 = jnp.clip((_mm_right_exact(r1, bd) + (1 << (i2 - 1))) >> i2, -32768, 32767)
        rec = jnp.clip(pred.astype(jnp.int32) + r2, 0, 255).astype(jnp.uint8)
        return rec

    return fn


for stage in ["res", "a1", "coeffs", "q", "r1", "full"]:
    timed(f"upto {stage}", upto(stage), src, pred)


# Transpose-canceling right-mul variant
def right_mul(src, pred):
    res = src.astype(jnp.int32) - pred.astype(jnp.int32)
    a1 = jnp.einsum("nij,kj->nik", res.astype(jnp.bfloat16), bd,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    st1t = wrap16((a1 + (1 << (s1 - 1))) >> s1).transpose(0, 2, 1)  # (n, k̂, i)
    # coeffsT = st1t @ bd^T
    hi = (st1t >> 8).astype(jnp.bfloat16)
    lo = jnp.bitwise_and(st1t, 255).astype(jnp.bfloat16)
    ct = 256 * jnp.einsum("nki,mi->nkm", hi, bd, preferred_element_type=jnp.float32).astype(jnp.int32) \
        + jnp.einsum("nki,mi->nkm", lo, bd, preferred_element_type=jnp.float32).astype(jnp.int32)
    coeffsT = wrap16((ct + (1 << (s2 - 1))) >> s2)
    sign = jnp.where(coeffsT < 0, -1, 1)
    q = ((jnp.abs(coeffsT) * qscale + (qoffset << (qshift - 16))) >> qshift) * sign
    q = jnp.clip(q, -32768, 32767)
    dq = jnp.clip((q * dscale + (1 << (dshift - 1))) >> dshift, -32768, 32767)
    # r1T = dqT @ bd  (we hold dq in T layout already)
    hi = (dq >> 8).astype(jnp.bfloat16)
    lo = jnp.bitwise_and(dq, 255).astype(jnp.bfloat16)
    r1t = 256 * jnp.einsum("nkm,mi->nki", hi, bd, preferred_element_type=jnp.float32).astype(jnp.int32) \
        + jnp.einsum("nkm,mi->nki", lo, bd, preferred_element_type=jnp.float32).astype(jnp.int32)
    r1t = jnp.clip((r1t + (1 << (i1 - 1))) >> i1, -32768, 32767)
    r1 = r1t.transpose(0, 2, 1)
    hi = (r1 >> 8).astype(jnp.bfloat16)
    lo = jnp.bitwise_and(r1, 255).astype(jnp.bfloat16)
    r2 = 256 * jnp.einsum("nik,kj->nij", hi, bd, preferred_element_type=jnp.float32).astype(jnp.int32) \
        + jnp.einsum("nik,kj->nij", lo, bd, preferred_element_type=jnp.float32).astype(jnp.int32)
    r2 = jnp.clip((r2 + (1 << (i2 - 1))) >> i2, -32768, 32767)
    return jnp.clip(pred.astype(jnp.int32) + r2, 0, 255).astype(jnp.uint8)


timed("right-mul variant full", right_mul, src, pred)

# Sanity: bit-identical
a = np.asarray(jax.jit(upto("full"))(src, pred))
bb = np.asarray(jax.jit(right_mul)(src, pred))
print("bit-identical:", np.array_equal(a, bb))
