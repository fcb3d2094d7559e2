"""Probe the eval epilogue (fp32 bilinear logit upsample + argmax,
reference eval_base.py:168) on the real TPU at flagship shapes:
coarse logits (32, 256, 256, 8) bf16 -> pred (32, 1024, 1024) uint8.

The matmul-formulated resize runs ~172 GFLOP of fp32 matmul and ~2.9 GB of
HBM traffic per batch; if it shows up at >3 ms/iter it is the last
non-roofline item in the 130 ms flagship iteration (246 t/s/chip).

Chain-probe methodology per CLAUDE.md: op chained inside one jit via
lax.scan with a per-iteration input perturbation (defeats CSE), minus a
slice-baseline chain at the same shapes.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from segland_tpu.ops.resize import resize_bilinear

TILE = 1024
B, H, K = 32, 256, 8
CHAIN, ITERS = 8, 3
probe = jax.jit(lambda o: o.astype(jnp.int32).sum())


def chain_time(op, x):
    @jax.jit
    def run(x):
        def body(c, i):
            x1 = c + i.astype(c.dtype)
            return c, op(x1).astype(jnp.float32).mean()
        _, ys = lax.scan(body, x, jnp.arange(CHAIN, dtype=jnp.float32))
        return ys.sum()
    for _ in range(2):
        out = run(x)
    float(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = run(x)
    float(probe(out))
    return (time.time() - t0) / (ITERS * CHAIN) * 1000


def post(logits):
    logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE),
                             align_corners=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.uint8)


def post_resize_only(logits):
    return resize_bilinear(logits.astype(jnp.float32), (TILE, TILE),
                           align_corners=True)


def post_bf16_resize(logits):
    # counterfactual: keep the resize in bf16 (NOT protocol-exact)
    return jnp.argmax(resize_bilinear(logits, (TILE, TILE),
                                      align_corners=True), axis=-1)


def main():
    print(jax.devices(), flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, K)).astype(jnp.bfloat16)
    base = chain_time(lambda a: a[..., :1, :1], x)
    print(f"baseline chain: {base:.2f} ms", flush=True)
    for name, op in (("post (fp32 resize+argmax)", post),
                     ("resize only (fp32)", post_resize_only),
                     ("bf16 resize+argmax (counterfactual)", post_bf16_resize)):
        print(f"{name}: {chain_time(op, x) - base:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
