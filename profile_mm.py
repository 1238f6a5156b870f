"""Micro-bench: which matmul formulation is fast on this chip?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
M, K, N = 32640, 64, 64
x32 = jnp.asarray(rng.integers(-255, 256, (M, K), dtype=np.int32))
xb = x32.astype(jnp.bfloat16)
xf = x32.astype(jnp.float32)
w_np = rng.integers(-90, 91, (K, N)).astype(np.float32)
wb = jnp.asarray(w_np).astype(jnp.bfloat16)
wf = jnp.asarray(w_np)
x3 = xb.reshape(510, 64, 64)

ITERS = 64


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    gf = 2 * M * K * N / 1e9
    print(f"{name:40s} {dt:8.3f} ms  {gf/dt*1000:8.1f} GFLOP/s")


timed("2d bf16xbf16->f32", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), xb, wb)
timed("2d bf16->f32 ->int32", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.int32), xb, wb)
timed("2d f32xf32->f32", lambda a, b: jnp.dot(a, b), xf, wf)
timed("3d einsum nij,kj->nik", lambda a, b: jnp.einsum("nij,kj->nik", a, b, preferred_element_type=jnp.float32), x3, wb)
timed("3d einsum nij,jk->nik", lambda a, b: jnp.einsum("nij,jk->nik", a, b, preferred_element_type=jnp.float32), x3, wb)
timed("2d from int32 cast in-graph", lambda a, b: jnp.dot(a.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32).astype(jnp.int32), x32, wb)

# wider N
w2 = jnp.asarray(rng.integers(-90, 91, (K, 128)).astype(np.float32)).astype(jnp.bfloat16)
timed("2d N=128", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), xb, w2)
w4 = jnp.asarray(rng.integers(-90, 91, (128, 128)).astype(np.float32)).astype(jnp.bfloat16)
x128 = jnp.asarray(rng.integers(-255, 256, (M // 2, 128), dtype=np.int32)).astype(jnp.bfloat16)
timed("2d M=16320 K=128 N=128", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), x128, w4)
