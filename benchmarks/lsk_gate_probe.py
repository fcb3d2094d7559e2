"""Cumulative-prefix dissection of LSKAttention at stage-0 (256^2x32, b16):
time growing prefixes of the op chain to attribute the ~8 ms of glue the
per-op probe missed, and A/B the gate-tail rewrites that avoid 2-channel
tensors (pad-to-32 squeeze conv).

Usage: python benchmarks/lsk_gate_probe.py
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


def main():
    x = jax.random.normal(key, (B, H, H, C)).astype(jnp.bfloat16)
    base = chain_time(lambda a: a[..., :1, :1, :1], x)
    print(f"baseline: {base:.2f} ms", flush=True)

    dt = jnp.bfloat16
    conv = lambda feats, k, dil, groups: nn.Conv(
        feats, (k, k), padding=[(dil * (k // 2),) * 2] * 2, kernel_dilation=(dil, dil),
        feature_group_count=groups, dtype=dt)

    p1 = conv(C, 1, 1, 1);      vp1 = p1.init(key, x)
    d5 = conv(C, 5, 1, C);      vd5 = d5.init(key, x)
    d7 = conv(C, 7, 3, C);      vd7 = d7.init(key, x)
    c1 = conv(C // 2, 1, 1, 1); vc1 = c1.init(key, x)
    c2 = conv(C // 2, 1, 1, 1); vc2 = c2.init(key, x)
    sq = conv(2, 7, 1, 1)
    vsq = sq.init(key, jnp.zeros((1, 8, 8, 2), dt))
    cc = conv(C, 1, 1, 1);      vcc = cc.init(key, jnp.zeros((1, 8, 8, C // 2), dt))
    p2 = conv(C, 1, 1, 1);      vp2 = p2.init(key, x)

    w_sq = vsq["params"]["kernel"]  # (7,7,2,2)
    b_sq = vsq["params"]["bias"]

    def prefix(n, squeeze_mode="ref"):
        def f(a):
            h = p1.apply(vp1, a)
            if n == 1: return h
            h = nn.gelu(h, approximate=False)
            a1 = d5.apply(vd5, h)
            if n == 2: return a1
            a2 = d7.apply(vd7, a1)
            if n == 3: return a2
            a1 = c1.apply(vc1, a1)
            a2 = c2.apply(vc2, a2)
            if n == 4: return a1 + a2
            attn = jnp.concatenate([a1, a2], axis=-1)
            avg = jnp.mean(attn, axis=-1, keepdims=True)
            mx = jnp.max(attn, axis=-1, keepdims=True)
            if n == 5: return avg + mx
            if squeeze_mode == "ref":
                agg = jnp.concatenate([avg, mx], axis=-1)
                sig = nn.sigmoid(sq.apply(vsq, agg))
                s0, s1 = sig[..., 0:1], sig[..., 1:2]
            else:
                # pad the 2 gate maps to 32 lanes and run one dense 7x7
                # 32->32 conv whose weights are zero outside [:2,:2]
                agg32 = jnp.concatenate(
                    [avg, mx, jnp.zeros(avg.shape[:-1] + (30,), avg.dtype)], -1)
                w32 = jnp.zeros((7, 7, 32, 32), dt).at[:, :, :2, :2].set(w_sq)
                out = lax.conv_general_dilated(
                    agg32.astype(dt), w32, (1, 1), [(3, 3)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                sig = nn.sigmoid(out + b_sq[0])
                s0, s1 = sig[..., 0:1], sig[..., 1:2]
            if n == 6: return s0 + s1
            attn = a1 * s0 + a2 * s1
            attn = cc.apply(vcc, attn)
            if n == 7: return attn
            h2 = h * attn  # note: reference multiplies pre-gelu x; close enough for timing
            return p2.apply(vp2, h2) + a
        return f

    for n in range(1, 9):
        t = chain_time(prefix(n), x) - base
        print(f"prefix {n}: {t:6.2f} ms", flush=True)
    for n in (6, 7, 8):
        t = chain_time(prefix(n, "pad32"), x) - base
        print(f"prefix {n} pad32-squeeze: {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
