"""Probe: swin/convnext 4x4/s4 patch-embed conv on [8,1024,1024,3].

C_in=3 occupies 3 of 128 lanes; hypothesis: XLA's conv here is pathologically
slow and a space-to-depth + dense matmul (exactly equal math) fixes it.
"""
import time
import sys

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")

B, H, W = 8, 1024, 1024
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())


def timeit(f, *a):
    for _ in range(2):
        out = f(*a)
    float(probe(out))
    t0 = time.time()
    for _ in range(5):
        out = f(*a)
    float(probe(out))
    return (time.time() - t0) / 5 * 1000


x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), jnp.float32)
k = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3, 96), jnp.float32) * 0.1
b = jax.random.normal(jax.random.PRNGKey(2), (96,)) * 0.1


@jax.jit
def conv_path(x, k, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(jnp.bfloat16)


@jax.jit
def s2d_path(x, k, b):
    # [B,H,W,3] -> [B,H/4,4,W/4,4,3] -> [B,H/4,W/4,4*4*3]; kernel HWIO
    # flattens to [48,96] in the SAME (kh,kw,ci) order
    xb = x.astype(jnp.bfloat16)
    xb = xb.reshape(B, H // 4, 4, W // 4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, H // 4, W // 4, 48)
    kb = k.astype(jnp.bfloat16).reshape(48, 96)
    return jnp.dot(xb, kb, preferred_element_type=jnp.float32).astype(jnp.bfloat16) + b.astype(jnp.bfloat16)


@jax.jit
def s2d_uint8_path(xu, k, b):
    # device-normalize serving path: uint8 in, s2d on uint8 (4x less HBM)
    xb = (xu.astype(jnp.bfloat16) / 255.0)
    xb = xb.reshape(B, H // 4, 4, W // 4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, H // 4, W // 4, 48)
    kb = k.astype(jnp.bfloat16).reshape(48, 96)
    return jnp.dot(xb, kb, preferred_element_type=jnp.float32).astype(jnp.bfloat16) + b.astype(jnp.bfloat16)


o1 = conv_path(x, k, b)
o2 = s2d_path(x, k, b)
import numpy as np
err = float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max())
print(f"max |conv - s2d| = {err:.2e}", flush=True)
print(f"conv 4x4s4 : {timeit(conv_path, x, k, b):.2f} ms", flush=True)
print(f"s2d matmul : {timeit(s2d_path, x, k, b):.2f} ms", flush=True)
xu = (jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, 3)) * 255).astype(jnp.uint8)
print(f"s2d uint8  : {timeit(s2d_uint8_path, xu, k, b):.2f} ms", flush=True)

# resnet stem for comparison: 7x7/s2 on 3 channels
k7 = jax.random.normal(jax.random.PRNGKey(4), (7, 7, 3, 64), jnp.float32) * 0.1


@jax.jit
def stem_path(x, k7):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k7.astype(jnp.bfloat16), (2, 2),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


print(f"resnet stem 7x7s2: {timeit(stem_path, x, k7):.2f} ms", flush=True)

# s2d_conv op (the production rewrite in segland_tpu/ops/stem.py)
from segland_tpu.ops.stem import s2d_conv

f_swin = jax.jit(lambda x, k: s2d_conv(x, k, 4, 0, compute_dtype=jnp.bfloat16))
print(f"s2d_conv swin 4x4s4 : {timeit(f_swin, x, k):.2f} ms", flush=True)
f_stem = jax.jit(lambda x, k: s2d_conv(x, k, 2, 3, compute_dtype=jnp.bfloat16))
print(f"s2d_conv resnet 7x7s2: {timeit(f_stem, x, k7):.2f} ms", flush=True)
k7l = jax.random.normal(jax.random.PRNGKey(5), (7, 7, 3, 32), jnp.float32) * 0.1
f_lsk = jax.jit(lambda x, k: s2d_conv(x, k, 4, 3, compute_dtype=jnp.bfloat16))
print(f"s2d_conv lsk 7x7s4  : {timeit(f_lsk, x, k7l):.2f} ms", flush=True)
