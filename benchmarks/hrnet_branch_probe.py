"""Why do HRNet's dense 3x3 small-channel convs run at 4% of MXU peak?
A/B at branch0 shapes (8,256,256,32) b16, all 9.66 GFLOP-equivalent:

  1. reference 3x3 32->32 conv (suspected: C=32 pads to 128 lanes in HBM
     -> 4x traffic AND 4x MXU padding);
  2. W-packed k=4 band conv (3,3,128,128): full lanes, 4x FLOPs;
  3. 2x2 space-to-depth conv (3,3,128,128): full lanes, 4x FLOPs;
  4. same-FLOP dense 3x3 128->128 @ (8,128,128,128) (branch2-like shape);
  5. conv+bn+relu chain vs bare conv (epilogue fusion check);
  6. full BasicBlock x4 chain reference vs W-packed (BN folded, eval).

Usage: python benchmarks/hrnet_branch_probe.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from segland_tpu.ops import packed as pk

B, H, C = 8, 256, 32
K = 4
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


def conv(x, w, pad=1):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dense_band_weights(w, k):
    """(kh,kh,Ci,Co) dense stride-1 kernel -> W-packed (kh,kw_p,kCi,kCo)."""
    kh, _, ci, co = w.shape
    p, pads = pk._dw_placement(kh, 1, k)
    p = jnp.asarray(p, w.dtype)
    wk = jnp.einsum("ytcd,tqsj->yqscjd", w, p)
    return wk.reshape(kh, p.shape[1], k * ci, k * co), pads


def main():
    x = jax.random.normal(key, (B, H, H, C)).astype(jnp.bfloat16)
    base = chain_time(lambda a: a[..., :1, :1, :1], x)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C)) * 0.1).astype(jnp.bfloat16)
    m = lambda name, op, xx=x, b=base: print(
        f"{name}: {chain_time(op, xx) - b:6.2f} ms", flush=True)

    m("3x3 32->32 ref", lambda a: conv(a, w))

    wk, (pl, ph) = dense_band_weights(w, K)
    def conv_pk(a):
        ap = pk.pack(a, K)
        y = lax.conv_general_dilated(
            ap, wk, (1, 1), [(1, 1), (pl, ph)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pk.unpack(y, K)
    m("3x3 W-packed k=4", conv_pk)
    d = jnp.max(jnp.abs(jax.jit(conv_pk)(x).astype(jnp.float32)
                        - jax.jit(lambda a: conv(a, w))(x).astype(jnp.float32)))
    print(f"  packed max|diff| = {float(d):.2e}", flush=True)

    # s2d: (B,H,W,C) -> (B,H/2,W/2,4C); conv becomes (3,3,4C,4C) with the
    # 2x2-phase taps folded in.  Build by brute force placement.
    w_np = np.asarray(w, np.float32)
    ws2d = np.zeros((4, 4, 4 * C, 4 * C), np.float32)
    # output phase (a,b) at block (i,j) = sum_{dy,dx} w[dy+1,dx+1] x[2i+a+dy, 2j+b+dx]
    for a in range(2):
        for b_ in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    sy, sx = 2 + a + dy, 2 + b_ + dx  # +2: align to block grid from (-1)
                    by, py = sy // 2 - 1, sy % 2
                    bx, px = sx // 2 - 1, sx % 2
                    ws2d[by + 1, bx + 1, (py * 2 + px) * C:(py * 2 + px + 1) * C,
                         (a * 2 + b_) * C:(a * 2 + b_ + 1) * C] += w_np[dy + 1, dx + 1]
    ws2d_j = jnp.asarray(ws2d, jnp.bfloat16)

    def conv_s2d(a):
        bb, hh, ww, cc = a.shape
        ap = a.reshape(bb, hh // 2, 2, ww // 2, 2, cc).transpose(0, 1, 3, 2, 4, 5)
        ap = ap.reshape(bb, hh // 2, ww // 2, 4 * cc)
        y = lax.conv_general_dilated(
            ap, ws2d_j, (1, 1), [(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(bb, hh // 2, ww // 2, 2, 2, cc).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(bb, hh, ww, cc)
    m("3x3 s2d 2x2 (4x4 kernel)", conv_s2d)
    d2 = jnp.max(jnp.abs(jax.jit(conv_s2d)(x).astype(jnp.float32)
                         - jax.jit(lambda a: conv(a, w))(x).astype(jnp.float32)))
    print(f"  s2d max|diff| = {float(d2):.2e}", flush=True)

    # same-FLOP big-channel control (branch2-like)
    x2 = jax.random.normal(key, (B, 128, 128, 128)).astype(jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, 128, 128)) * 0.1).astype(jnp.bfloat16)
    b2t = chain_time(lambda a: a[..., :1, :1, :1], x2)
    m("3x3 128->128 @128^2 (same FLOPs)", lambda a: conv(a, w2), x2, b2t)

    # epilogue fusion check: conv + affine + relu
    g = jnp.ones((C,), jnp.bfloat16) * 1.1
    m("conv+affine+relu 32ch", lambda a: jax.nn.relu(conv(a, w) * g + 0.3))


if __name__ == "__main__":
    main()
