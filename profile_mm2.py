import time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
n, b = 510, 64
src = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
pred = jnp.asarray(rng.integers(0, 256, (n, b, b), dtype=np.uint8))
wb = jnp.asarray(rng.integers(-90, 91, (b, b)).astype(np.float32)).astype(jnp.bfloat16)
ITERS = 64

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/ITERS*1e3:8.3f} ms")

def sub_cast(src, pred):
    return (src.astype(jnp.int32) - pred.astype(jnp.int32)).astype(jnp.bfloat16)

timed("sub+cast only", sub_cast, src, pred)

def sub_mm(src, pred):
    r = (src.astype(jnp.int32) - pred.astype(jnp.int32)).astype(jnp.bfloat16)
    return jnp.einsum("nij,kj->nik", r, wb, preferred_element_type=jnp.float32)

timed("sub+cast+einsum f32 out", sub_mm, src, pred)

def sub_mm_i32(src, pred):
    r = (src.astype(jnp.int32) - pred.astype(jnp.int32)).astype(jnp.bfloat16)
    return jnp.einsum("nij,kj->nik", r, wb, preferred_element_type=jnp.float32).astype(jnp.int32)

timed("sub+cast+einsum ->int32", sub_mm_i32, src, pred)

def sub16_mm(src, pred):
    r = (src.astype(jnp.int16) - pred.astype(jnp.int16)).astype(jnp.bfloat16)
    return jnp.einsum("nij,kj->nik", r, wb, preferred_element_type=jnp.float32)

timed("int16 sub+cast+einsum", sub16_mm, src, pred)

def sub_f32_mm(src, pred):
    r = (src.astype(jnp.float32) - pred.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.einsum("nij,kj->nik", r, wb, preferred_element_type=jnp.float32)

timed("f32 sub+cast+einsum", sub_f32_mm, src, pred)

def barrier_mm(src, pred):
    r = (src.astype(jnp.int32) - pred.astype(jnp.int32)).astype(jnp.bfloat16)
    r = jax.lax.optimization_barrier(r)
    return jnp.einsum("nij,kj->nik", r, wb, preferred_element_type=jnp.float32)

timed("sub+cast+BARRIER+einsum", barrier_mm, src, pred)
