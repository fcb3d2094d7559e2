"""LSK conv-MLP reformulations at stage-0 shapes (256^2 x 32 -> hidden 256,
b16).  The hidden tensor is 537 MB/bf16: fc1 -> dw3x3 -> gelu -> fc2 costs
~4 HBM round-trips of it.  Since fc1 (1x1) and dw3x3 are adjacent LINEAR
ops, they compose into ONE dense 3x3 32->256 conv:
  w[dy,dx,ci,co] = wf1[ci,co] * wdw[dy,dx,co]
(7x the MACs — 154 GFLOP, ~0.8 ms at peak — but one hidden write instead
of three hidden passes).  Variants measured:
  A. reference: fc1 + dw + gelu(exact) + fc2
  B. packed fc1 + dw + gelu + packed fc2 (current model path)
  C. merged conv3x3 + gelu(exact) + fc2
  D. merged conv3x3 + gelu(tanh) + fc2
  E. D with packed fc2

Usage: python benchmarks/lsk_mlp_merge_probe.py [H C ratio]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from segland_tpu.ops import packed as pk

B = 16
H = int(sys.argv[1]) if len(sys.argv) > 1 else 256
C = int(sys.argv[2]) if len(sys.argv) > 2 else 32
RATIO = int(sys.argv[3]) if len(sys.argv) > 3 else 8
HID = C * RATIO
K = pk.pack_k(C, min_k=2)
CHAIN, ITERS = 4, 3
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
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, H, H, C)).astype(dt)
    wf1 = (jax.random.normal(jax.random.PRNGKey(1), (C, HID)) * 0.1).astype(dt)
    bf1 = jnp.zeros((HID,), dt)
    wdw = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, 1, HID)) * 0.1).astype(dt)
    bdw = jnp.zeros((HID,), dt)
    wf2 = (jax.random.normal(jax.random.PRNGKey(3), (HID, C)) * 0.1).astype(dt)
    bf2 = jnp.zeros((C,), dt)
    base = chain_time(lambda a: a[..., :1, :1, :1], x)
    m = lambda name, op: print(f"{name}: {chain_time(op, x) - base:6.2f} ms", flush=True)

    def dw(a):
        return lax.conv_general_dilated(
            a, wdw, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=HID) + bdw

    def A(a):
        h = a @ wf1 + bf1
        h = nn.gelu(dw(h), approximate=False)
        return h @ wf2 + bf2
    m("A fc1+dw+gelu+fc2 (plain)", A)

    def Bv(a):
        hp = pk.conv1x1_packed(pk.pack(a, K), wf1, bf1, K)
        h = nn.gelu(dw(pk.unpack(hp, K)), approximate=False)
        return pk.unpack(pk.conv1x1_packed(pk.pack(h, K), wf2, bf2, K), K)
    m("B packed fc1/fc2 (current)", Bv)

    # merged: w[dy,dx,ci,co] = wf1[ci,co]*wdw[dy,dx,0,co]; bias folds:
    # dw(fc1(x)) = conv3(x; w) + (dw applied to const bf1) + bdw
    wm = (wf1[None, None].astype(jnp.float32)
          * wdw[:, :, 0, :][:, :, None, :].astype(jnp.float32)).astype(dt)
    bm = (bf1.astype(jnp.float32) * jnp.sum(wdw[:, :, 0, :].astype(jnp.float32), (0, 1))
          + bdw.astype(jnp.float32)).astype(dt)

    def merged(a):
        return lax.conv_general_dilated(
            a, wm, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bm

    def Cv(a):
        return nn.gelu(merged(a), approximate=False) @ wf2 + bf2
    m("C merged conv3 + gelu(exact) + fc2", Cv)

    def Dv(a):
        return nn.gelu(merged(a), approximate=True) @ wf2 + bf2
    m("D merged conv3 + gelu(tanh) + fc2", Dv)

    def Ev(a):
        h = nn.gelu(merged(a), approximate=True)
        return pk.unpack(pk.conv1x1_packed(pk.pack(h, K), wf2, bf2, K), K)
    m("E = D with packed fc2", Ev)

    da = jnp.max(jnp.abs(jax.jit(A)(x).astype(jnp.float32)
                         - jax.jit(Cv)(x).astype(jnp.float32)))
    print(f"merged-vs-ref max|diff| = {float(da):.2e} (bf16 weight-product rounding)",
          flush=True)


if __name__ == "__main__":
    main()
