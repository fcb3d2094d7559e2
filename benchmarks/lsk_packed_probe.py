"""A/B cheap rewrites of the LSK stage-0 attention (256^2x32 b16, 14.7 ms):

  1. tanh-GELU instead of exact-erf GELU in bf16 (same policy as the fused
     Pallas kernels: 5e-4 max err, 30x below bf16 noise).
  2. W-packed layout (B,H,W,32) -> (B,H,W/4,128): dw5/dw7d3 as dense
     block-banded convs on the MXU (extra zero-block products add exactly
     0 in the fp32 accumulator -> EXACT numerics), 1x1s as block-diagonal
     kron(I4, W) matmuls. Measures pack/unpack relayout cost too.

Usage: python benchmarks/lsk_packed_probe.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")

B, H, C = 16, 256, 32
K = 128 // C  # pack factor 4
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


def pack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // K, K * c)


def unpack(x):
    b, h, wp, kc = x.shape
    return x.reshape(b, h, wp * K, kc // K)


def dw_packed_kernel(w_dw, kh, dil, c=C, k=K):
    """Depthwise (kh,kh) dil kernel (kh,kh,1,c) -> packed dense conv kernel
    (kh, kw_p, k*c, k*c) that reproduces the W-axis taps via block-banded
    channel mixing.  Output pixel j (in packed col g) channel ch uses input
    pixel 4g+j+off, i.e. packed col g+(j+off)//4, slot (j+off)%4."""
    r = (kh // 2) * dil
    # packed-col offsets needed: from -(r+k-1)//k to +(r)//k when j varies
    lo = -((r + k - 1) // k)
    hi = (r + k - 1) // k
    kw_p = hi - lo + 1
    wk = np.zeros((kh, kw_p, k * c, k * c), np.float32)
    w_np = np.asarray(w_dw, np.float32).reshape(kh, kh, c)
    for j in range(k):            # output slot within packed col
        for t in range(kh):       # tap index along W
            off = (t - kh // 2) * dil
            src = j + off
            g, slot = src // k, src % k
            if not (lo <= g <= hi):
                raise AssertionError("bad band math")
            for ch in range(c):
                wk[:, g - lo, slot * c + ch, j * c + ch] += w_np[:, t, ch]
    return jnp.asarray(wk, jnp.bfloat16), (r, -lo * k, hi * k)


def dw_packed_apply(xp, wk, kh, dil, pad_cols):
    r, pl_, pr_ = pad_cols
    # pad W (packed cols) so band taps stay in range; H padded same as ref
    return lax.conv_general_dilated(
        xp, wk, (1, 1),
        [((kh // 2) * dil,) * 2, (pl_ // K, pr_ // K)],
        rhs_dilation=(dil, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    x = jax.random.normal(key, (B, H, H, C)).astype(jnp.bfloat16)
    base = chain_time(lambda a: a[..., :1, :1, :1], x)
    print(f"baseline: {base:.2f} ms", flush=True)

    # --- gelu exact vs tanh on 32ch
    measure = lambda name, op, xx=x, b=base: print(
        f"{name}: {chain_time(op, xx) - b:6.2f} ms", flush=True)
    measure("gelu exact @32", lambda a: nn.gelu(a, approximate=False))
    measure("gelu tanh  @32", lambda a: nn.gelu(a, approximate=True))

    # --- pack/unpack roundtrip cost
    measure("pack+unpack roundtrip", lambda a: unpack(pack(a)))

    # --- dw5 / dw7d3: reference vs packed-dense
    w5 = jax.random.normal(key, (5, 5, 1, C), jnp.bfloat16) * 0.1
    w7 = jax.random.normal(key, (7, 7, 1, C), jnp.bfloat16) * 0.1

    def dw_ref(a, w, kh, dil):
        return lax.conv_general_dilated(
            a, jnp.moveaxis(w, 3, 2).reshape(kh, kh, 1, C), (1, 1),
            [((kh // 2) * dil,) * 2] * 2, rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)

    wk5, pads5 = dw_packed_kernel(np.moveaxis(np.asarray(w5), 3, 2), 5, 1)
    wk7, pads7 = dw_packed_kernel(np.moveaxis(np.asarray(w7), 3, 2), 7, 3)

    measure("dw5 ref", lambda a: dw_ref(a, w5, 5, 1))
    measure("dw5 packed-dense",
            lambda a: unpack(dw_packed_apply(pack(a), wk5, 5, 1, pads5)))
    measure("dw7d3 ref", lambda a: dw_ref(a, w7, 7, 3))
    measure("dw7d3 packed-dense",
            lambda a: unpack(dw_packed_apply(pack(a), wk7, 7, 3, pads7)))

    # numerics check (on CPU-exactness grounds: fp32 accum, zero blocks)
    f_ref = jax.jit(lambda a: dw_ref(a, w5, 5, 1))
    f_pk = jax.jit(lambda a: unpack(dw_packed_apply(pack(a), wk5, 5, 1, pads5)))
    d = jnp.max(jnp.abs(f_ref(x).astype(jnp.float32) - f_pk(x).astype(jnp.float32)))
    print(f"dw5 packed max|diff| = {float(d):.2e}", flush=True)
    f_ref7 = jax.jit(lambda a: dw_ref(a, w7, 7, 3))
    f_pk7 = jax.jit(lambda a: unpack(dw_packed_apply(pack(a), wk7, 7, 3, pads7)))
    d7 = jnp.max(jnp.abs(f_ref7(x).astype(jnp.float32) - f_pk7(x).astype(jnp.float32)))
    print(f"dw7d3 packed max|diff| = {float(d7):.2e}", flush=True)

    # --- 1x1 conv 32->32: ref vs packed blockdiag
    w1 = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.1
    wbd = jnp.asarray(np.kron(np.eye(K, dtype=np.float32),
                              np.asarray(w1, np.float32)), jnp.bfloat16)
    measure("1x1 32->32 ref", lambda a: a @ w1)
    measure("1x1 packed blockdiag", lambda a: unpack(pack(a) @ wbd))

    # --- whole gate section packed end-to-end (pack once, unpack once)
    def gate_ref(a):
        h = nn.gelu(a @ w1, approximate=True)
        a1 = dw_ref(h, w5, 5, 1)
        a2 = dw_ref(a1, w7, 7, 3)
        return a2

    def gate_packed(a):
        ap = pack(a)
        hp = nn.gelu(ap @ wbd, approximate=True)
        a1 = dw_packed_apply(hp, wk5, 5, 1, pads5)
        a2 = dw_packed_apply(a1, wk7, 7, 3, pads7)
        return unpack(a2)

    measure("gate(1x1+gelu+dw5+dw7) ref", gate_ref)
    measure("gate packed", gate_packed)
    dg = jnp.max(jnp.abs(jax.jit(gate_ref)(x).astype(jnp.float32)
                         - jax.jit(gate_packed)(x).astype(jnp.float32)))
    print(f"gate packed max|diff| = {float(dg):.2e}", flush=True)


if __name__ == "__main__":
    main()
