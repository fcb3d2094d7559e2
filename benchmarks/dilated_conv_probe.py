"""Probe: are dilated int8/bf16 convs slower per-FLOP than dense ones on TPU?

deeplab/pspnet at OS8 spend most FLOPs in resnet layer3 (dil 2), layer4
(dil 4) and ASPP (rates 12/24/36) at 128x128.  If XLA's dilated-conv path
underperforms the dense one, an exact phase decomposition (space-to-batch:
[B,H,W,C] -> [B*d^2, H/d, W/d, C], dense conv, inverse) is a drop-in win —
dilation d with SAME padding is exactly a dense conv per phase.

Each measurement chains CHAIN conv applications inside one jit to amortize
the axon tunnel's ~4-6 ms dispatch latency (see BASELINE.md).
"""
import time

import jax
import jax.numpy as jnp
from functools import partial

B, H, W, C = 8, 128, 128, 1024
CHAIN = 10
ITERS = 5


def conv(x, k, dil, dtype):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32,
    )


@partial(jax.jit, static_argnums=(2, 3))
def chained(x, k, dil, dtype):
    def body(x, _):
        y = conv(x, k, dil, dtype)
        # requant/cast epilogue, as in the real int8 path
        y = (y.astype(jnp.float32) * 1e-3)
        y = jnp.clip(jnp.round(y), -127, 127).astype(dtype) if dtype == jnp.int8 \
            else y.astype(dtype)
        return y, ()
    x, _ = jax.lax.scan(body, x, None, length=CHAIN)
    return x


def s2b(x, d):
    """[B,H,W,C] -> [B*d*d, H/d, W/d, C] exact phase decomposition."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * d * d, h // d, w // d, c)


def b2s(x, d, b0):
    bd, h, w, c = x.shape
    x = x.reshape(b0, d, d, h, w, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b0, h * d, w * d, c)


@partial(jax.jit, static_argnums=(2, 3))
def chained_s2b(x, k, dil, dtype):
    """Same chain, but phase-decomposed once around the whole chain."""
    b0 = x.shape[0]
    x = s2b(x, dil)
    def body(x, _):
        y = conv(x, k, 1, dtype)
        y = (y.astype(jnp.float32) * 1e-3)
        y = jnp.clip(jnp.round(y), -127, 127).astype(dtype) if dtype == jnp.int8 \
            else y.astype(dtype)
        return y, ()
    x, _ = jax.lax.scan(body, x, None, length=CHAIN)
    return b2s(x, dil, b0)


def run(fn, x, k, dil, dtype, tag):
    probe = jax.jit(lambda o: o.astype(jnp.int32).sum())
    for _ in range(2):
        out = fn(x, k, dil, dtype)
    int(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(x, k, dil, dtype)
    int(probe(out))
    dt = (time.time() - t0) / (ITERS * CHAIN)
    flops = 2 * B * H * W * C * C * 9
    print(f"{tag}: {dt*1000:7.2f} ms/conv  {flops/dt/1e12:6.1f} Tops/s", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        kx = jax.random.randint(jax.random.PRNGKey(0), (3, 3, C, C), -10, 10).astype(dtype) \
            if dtype == jnp.int8 else \
            (jax.random.normal(jax.random.PRNGKey(0), (3, 3, C, C)) * 0.01).astype(dtype)
        x = jax.random.randint(jax.random.PRNGKey(1), (B, H, W, C), -10, 10).astype(dtype) \
            if dtype == jnp.int8 else \
            jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C)).astype(dtype)
        for dil in (1, 2, 4):
            run(chained, x, kx, dil, dtype, f"{name} dil={dil} xla   ")
            if dil > 1:
                run(chained_s2b, x, kx, dil, dtype, f"{name} dil={dil} s2b   ")
