"""Decompose the stem-input cost: which op actually burns the ~8 ms —
the fp32 read? the cast? the s2d transpose? the matmul?"""
import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B, H, W = 8, 1024, 1024
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())


def timeit(name, f, *a):
    f = jax.jit(f)
    for _ in range(2):
        out = f(*a)
    float(probe(out))
    t0 = time.time()
    for _ in range(5):
        out = f(*a)
    float(probe(out))
    print(f"{name}: {(time.time()-t0)/5*1000:.2f} ms", flush=True)


x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), jnp.float32)
xm = jax.random.normal(jax.random.PRNGKey(0), (B, H, W * 3), jnp.float32)
xs = jax.random.normal(jax.random.PRNGKey(0), (B, H // 4, W // 4, 48), jnp.bfloat16)
xu = (jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3)) * 255).astype(jnp.uint8)
k = jax.random.normal(jax.random.PRNGKey(2), (48, 96), jnp.float32) * 0.1

timeit("fp32 [B,H,W,3] +1        ", lambda a: a + 1.0, x)
timeit("fp32 [B,H,W,3] cast bf16 ", lambda a: a.astype(jnp.bfloat16), x)
timeit("fp32 [B,H,W*3] +1        ", lambda a: a + 1.0, xm)
timeit("fp32 [B,H,W*3] cast bf16 ", lambda a: a.astype(jnp.bfloat16), xm)
timeit("fp32 [B,H,W,3] reshape-merge-cast", lambda a: a.reshape(B, H, -1).astype(jnp.bfloat16), x)
timeit("uint8 [B,H,W,3] cast bf16", lambda a: a.astype(jnp.bfloat16), xu)


def s2d_from_merged(a):
    y = a.astype(jnp.bfloat16).reshape(B, H // 4, 4, W // 4, 12)
    return y.transpose(0, 1, 3, 2, 4).reshape(B, H // 4, W // 4, 48)


timeit("merged->s2d (cast+T)     ", s2d_from_merged, xm)
timeit("matmul [.,48]@[48,96]    ",
       lambda a, kk: jnp.dot(a, kk.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16),
       xs, k)
