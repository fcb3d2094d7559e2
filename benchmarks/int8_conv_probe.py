"""Probe 2: bf16 vs int8 resnet-layer3-like block stack, chained IN-JIT so the
axon tunnel dispatch overhead (~4ms/call) amortizes over N blocks.

Block = 1x1 c->c/4, 3x3 c/4->c/4 d2, 1x1 c/4->c, relu+residual (bottleneck,
resnet50 layer3 at OS8: c=1024, feature 128x128, batch 8).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 8, 128, 128, 1024
NBLOCKS = 12  # resnet50 layer3 has 6 bottlenecks; 12 for better amortization


def conv(x, w, dil=1, pe=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(dil * (w.shape[0] // 2),) * 2] * 2,
        rhs_dilation=(dil, dil), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pe)


def timeit(fn, *args, iters=5, warmup=2):
    probe = jax.jit(lambda o: o.astype(jnp.float32).sum().astype(jnp.int32))
    for _ in range(warmup):
        out = fn(*args)
    int(probe(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    int(probe(out))
    return (time.time() - t0) / iters * 1000


def main():
    rng = np.random.RandomState(0)
    c4 = C // 4
    ws = []
    for _ in range(NBLOCKS):
        ws.append((rng.randn(1, 1, C, c4) * 0.03, rng.randn(3, 3, c4, c4) * 0.03,
                   rng.randn(1, 1, c4, C) * 0.03))
    x = rng.randn(B, H, W, C) * 0.5

    wb = [tuple(jnp.asarray(w, jnp.bfloat16) for w in t) for t in ws]
    wi = [tuple(jnp.asarray(np.clip(w * 1000, -127, 127).astype(np.int8)) for w in t) for t in ws]
    scs = [tuple(jnp.full((t[i].shape[-1],), 1e-4, jnp.float32) for i in range(3)) for t in ws]
    xb = jnp.asarray(x, jnp.bfloat16)
    xi8 = jnp.asarray(np.clip(x * 100, -127, 127).astype(np.int8))

    @jax.jit
    def f_bf16(x, ws):
        for w1, w2, w3 in ws:
            r = x
            y = jnp.maximum(conv(x, w1), 0)
            y = jnp.maximum(conv(y, w2, dil=2), 0)
            y = conv(y, w3)
            x = jnp.maximum(y + r, 0)
        return x

    @jax.jit
    def f_int8(x, ws, scs):
        # x arrives int8; each conv: int8 x int8 -> int32, dequant to bf16,
        # relu, requant to int8 (static scale). Residual kept int8.
        for (w1, w2, w3), (s1, s2, s3) in zip(ws, scs):
            r = x
            def q(y, s):
                y = jnp.maximum(y.astype(jnp.float32) * s, 0)
                return jnp.clip(y * 100.0, -127, 127).astype(jnp.int8)
            y = q(conv(x, w1, pe=jnp.int32), s1)
            y = q(conv(y, w2, dil=2, pe=jnp.int32), s2)
            y3 = conv(y, w3, pe=jnp.int32).astype(jnp.float32) * s3
            x = jnp.clip(jnp.maximum(y3 + r.astype(jnp.float32) * 0.01, 0) * 100.0, -127, 127).astype(jnp.int8)
        return x

    t_b = timeit(f_bf16, xb, wb)
    t_i = timeit(f_int8, xi8, wi, scs)
    flops = 2 * B * H * W * NBLOCKS * (C * c4 + c4 * c4 * 9 + c4 * C)
    print(f"bf16 stack:  {t_b:.1f} ms  {flops/t_b/1e9:.1f} TFLOP/s", flush=True)
    print(f"int8 stack:  {t_i:.1f} ms  {flops/t_i/1e9:.1f} Top/s   speedup x{t_b/t_i:.2f}", flush=True)


if __name__ == "__main__":
    main()
