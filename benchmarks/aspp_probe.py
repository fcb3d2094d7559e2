"""Where do deeplab_pop int8's 104 ms go?  Chained probes of the ASPP
dilated convs (rates 12/24/36, 2048->256 at 128^2) and the backbone stages,
int8 vs bf16, plus phase-decomposition (s2b) variants for large dilations."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

B, HW = 16, 128
CHAIN, ITERS = 6, 3
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())


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


_BASE = {}


def measure(name, op, x, flops=None):
    key = (x.shape, str(x.dtype))
    if key not in _BASE:
        _BASE[key] = chain_time(lambda a: a[..., :1, :1], x)
    ms = chain_time(op, x) - _BASE[key]
    extra = f"  {flops / ms * 1e3 / 1e12:6.1f} Top/s" if flops else ""
    print(f"{name}: {ms:7.2f} ms{extra}", flush=True)


def conv_op(k, dil, dtype):
    def op(x):
        y = lax.conv_general_dilated(
            x, k, (1, 1), "SAME", rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32)
        return (y.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)
    return op


def s2b_conv_op(k, dil, dtype, cout):
    """dilated conv == dense conv per phase grid (exact for SAME pad dil*(K//2))."""
    def op(x):
        b, h, w, c = x.shape
        d = dil
        hp = -(-h // d) * d
        xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, hp - h), (0, 0)))
        xs = xp.reshape(b, hp // d, d, hp // d, d, c).transpose(0, 2, 4, 1, 3, 5)
        xs = xs.reshape(b * d * d, hp // d, hp // d, c)
        y = lax.conv_general_dilated(
            xs, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32)
        y = y.reshape(b, d, d, hp // d, hp // d, cout).transpose(0, 3, 1, 4, 2, 5)
        y = y.reshape(b, hp, hp, cout)[:, :h, :w]
        return (y.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)
    return op


def main():
    cin, cout = 2048, 256
    flops = 2 * B * HW * HW * cin * cout * 9
    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        if dtype == jnp.int8:
            x = jax.random.randint(jax.random.PRNGKey(1), (B, HW, HW, cin), -10, 10).astype(dtype)
            k = jax.random.randint(jax.random.PRNGKey(0), (3, 3, cin, cout), -10, 10).astype(dtype)
        else:
            x = jax.random.normal(jax.random.PRNGKey(1), (B, HW, HW, cin)).astype(dtype)
            k = (jax.random.normal(jax.random.PRNGKey(0), (3, 3, cin, cout)) * 0.01).astype(dtype)
        for dil in (1, 6, 12, 18):
            measure(f"{name} 3x3 2048->256 dil={dil:2d} xla", conv_op(k, dil, dtype), x, flops)
            if dil > 1:
                measure(f"{name} 3x3 2048->256 dil={dil:2d} s2b", s2b_conv_op(k, dil, dtype, cout), x, flops)


if __name__ == "__main__":
    main()
