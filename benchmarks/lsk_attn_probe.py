"""Dissect LSKAttention at stage-0 shapes (256^2 x 32, b16): which of the
~13 ops burns the 14.7 ms?  Chain-probe each sub-op at its true operand
shape, plus candidate reformulations of the 2-channel conv_squeeze.

Usage: python benchmarks/lsk_attn_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")

B, H, C = 16, 256, 32
CHAIN, ITERS = 8, 3
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())
key = jax.random.PRNGKey(0)


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


_bases = {}


def measure(name, op, x):
    k = (x.shape, str(x.dtype))
    if k not in _bases:
        _bases[k] = chain_time(lambda a: a[..., :1, :1, :1], x)
    print(f"{name}: {chain_time(op, x) - _bases[k]:6.2f} ms", flush=True)


def conv_mod(feats, k, dil=1, groups=1):
    m = nn.Conv(feats, (k, k), padding=[(dil * (k // 2),) * 2] * 2,
                kernel_dilation=(dil, dil), feature_group_count=groups,
                dtype=jnp.bfloat16)
    return m


def main():
    x32 = jax.random.normal(key, (B, H, H, C)).astype(jnp.bfloat16)
    x16 = jax.random.normal(key, (B, H, H, C // 2)).astype(jnp.bfloat16)
    x2 = jax.random.normal(key, (B, H, H, 2)).astype(jnp.bfloat16)

    for name, feats, k, dil, groups, xin in (
        ("proj_1 1x1 32->32", C, 1, 1, 1, x32),
        ("dw5x5 @32", C, 5, 1, C, x32),
        ("dw7x7 dil3 @32", C, 7, 3, C, x32),
        ("conv1 1x1 32->16", C // 2, 1, 1, 1, x32),
        ("conv_squeeze 7x7 2->2", 2, 7, 1, 1, x2),
        ("conv 1x1 16->32", C, 1, 1, 1, x16),
    ):
        m = conv_mod(feats, k, dil, groups)
        v = m.init(key, xin)
        measure(name, lambda a, m=m, v=v: m.apply(v, a), xin)

    measure("gelu @32", lambda a: nn.gelu(a, approximate=False), x32)
    measure("mean+max pool ch (32->2)",
            lambda a: jnp.concatenate([jnp.mean(a, -1, keepdims=True),
                                       jnp.max(a, -1, keepdims=True)], -1), x32)
    measure("x*attn mul @32", lambda a: a * (a + 1), x32)

    # candidate squeeze reformulations
    w = jax.random.normal(key, (7, 7, 2, 2), jnp.bfloat16) * 0.1

    def squeeze_padded(a):
        # zero-pad channels 2->32 so XLA's conv emitter sees a sane lane count
        ap = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, 30)))
        wp = jnp.zeros((7, 7, 32, 2), jnp.bfloat16).at[:, :, :2, :].set(w)
        return lax.conv_general_dilated(ap, wp, (1, 1), [(3, 3), (3, 3)],
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    measure("squeeze as 2->32-padded conv", squeeze_padded, x2)

    def squeeze_shift(a):
        # 7x7x2->2 conv as 49 in-register shifts + adds on the (..,2) tensor
        out = jnp.zeros_like(a)
        af = a
        for dy in range(-3, 4):
            ay = jnp.roll(af, dy, axis=1)
            for dx in range(-3, 4):
                ax = jnp.roll(ay, dx, axis=2)
                out = out + ax @ w[dy + 3, dx + 3]
        return out
    measure("squeeze as 49 roll+matmul", squeeze_shift, x2)

    def squeeze_wpack(a):
        # pack 2ch into lanes by folding W: (B,H,W,2) -> (B,H,W/8,16)
        ap = a.reshape(B, H, H // 8, 16)
        return ap.sum() * 0 + a.sum()  # placeholder layout-cost probe
    # full attention for reference
    from segland_tpu.models.backbones.lsknet import LSKAttention
    attn = LSKAttention(C, dtype=jnp.bfloat16)
    va = attn.init(key, x32)
    measure("LSKAttention total", lambda a: attn.apply(va, a), x32)


if __name__ == "__main__":
    main()
