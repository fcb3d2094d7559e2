"""A/B pack/fold variants for the vggunet_pop hot surfaces (real TPU).

Surfaces (b2 1024^2, bf16, eval): enc1 = conv3->64 + conv64->64 with BN
glue at 1M px; up4 tail = conv128->64 + conv64->64 at 1M px.  Variants:
  plain  — convs + eval-BN affine + relu as flax emits them
  folded — BN folded into conv weights/bias (exact at eval), relu only
  packed — whole chain W-packed at k=2 (ops/packed.py band convs)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from segland_tpu.ops import packed as pk

B = 2
CHAIN, ITERS = 4, 4
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())
key = jax.random.PRNGKey(0)


def conv(x, w, b=None):
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


def chain_time(name, op, x):
    @jax.jit
    def run(x0):
        def body(c, i):
            x1 = c + i.astype(c.dtype)
            return c, op(x1).astype(jnp.float32).mean()
        _, ys = lax.scan(body, x0, jnp.arange(CHAIN, dtype=jnp.float32))
        return ys.sum()
    for _ in range(2):
        o = run(x)
    float(probe(o))
    t0 = time.time()
    for _ in range(ITERS):
        o = run(x)
    float(probe(o))
    dt = (time.time() - t0) / ITERS / CHAIN * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)


def mk(shape, k):
    return jax.random.normal(jax.random.fold_in(key, k), shape, jnp.bfloat16) * 0.05


def surface(tag, cins, couts, x_shape):
    ws = [mk((3, 3, ci, co), i) for i, (ci, co) in enumerate(zip(cins, couts))]
    # eval-BN affine params (scale, shift) per conv
    affs = [(mk((co,), 10 + i) + 1.0, mk((co,), 20 + i)) for i, co in enumerate(couts)]
    x = mk(x_shape, 99)

    def plain(x):
        for w, (g, b) in zip(ws, affs):
            x = jnp.maximum(conv(x, w) * g + b, 0)
        return x

    def folded(x):
        for w, (g, b) in zip(ws, affs):
            x = jnp.maximum(conv(x, w * g[None, None, None], b), 0)
        return x

    def packed(x):
        kpack = 2
        xp = pk.pack(x, kpack)
        for w, (g, b) in zip(ws, affs):
            xp = pk.conv_packed(xp, w * g[None, None, None], b, 1, kpack)
            xp = jnp.maximum(xp, 0)
        return pk.unpack(xp, kpack)

    chain_time(f"{tag} plain", plain, x)
    chain_time(f"{tag} folded", folded, x)
    chain_time(f"{tag} packed k2", packed, x)
    # numeric check packed vs folded
    d = float(jnp.max(jnp.abs(packed(x).astype(jnp.float32) - folded(x).astype(jnp.float32))))
    print(f"{tag} packed-vs-folded max|d| = {d:.2e}", flush=True)


if __name__ == "__main__":
    surface("enc1 3->64->64 1024^2", (4, 64), (64, 64), (B, 1024, 1024, 4))
    surface("up4 128->64->64 1024^2", (128, 64), (64, 64), (B, 1024, 1024, 128))
