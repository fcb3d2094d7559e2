"""Dissect the convnext stage-0 block (the flagship's dominant cost):
dwconv7 vs fused LN+MLP kernel vs the assembled block, plus row-tile and
residual-operand sensitivity of the kernel.  All timings use the in-jit
scan-chain protocol (CLAUDE.md: single-op jits are dispatch-bound over the
axon tunnel) with a per-iteration perturbation to defeat CSE.

Usage: python benchmarks/stage0_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from segland_tpu.ops import pallas_mlp

B, H, C, HID = 16, 256, 96, 384
CHAIN, ITERS = 8, 3
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


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, C)).astype(jnp.bfloat16)
    x2 = x.reshape(-1, C)
    m = x2.shape[0]
    base = chain_time(lambda a: a[..., :1, :1], x2)
    print(f"baseline chain ({m}x{C}): {base:.2f} ms", flush=True)

    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    w1 = jax.random.normal(key, (C, HID), jnp.float32) * 0.02
    b1 = jnp.zeros((HID,), jnp.float32)
    w2 = jax.random.normal(key, (HID, C), jnp.float32) * 0.02
    b2 = jnp.zeros((C,), jnp.float32)
    ls = jnp.full((C,), 1e-6, jnp.float32)

    # kernel alone, with/without residual operand, across forced tile sizes
    orig_tile_m = pallas_mlp._tile_m
    for tile in (1024, 2048, 4096, 8192):
        pallas_mlp._tile_m = lambda c, h, i, t=tile: t
        try:
            for res in (True, False):
                r = x2 if res else None
                t = chain_time(
                    lambda a, r=r: pallas_mlp.fused_ln_mlp(
                        a, gamma, beta, w1, b1, w2, b2, res=r, ls=ls, eps=1e-6),
                    x2) - base
                print(f"fused_ln_mlp tile={tile} res={int(res)}: {t:6.2f} ms "
                      f"({m // tile} steps)", flush=True)
        except Exception as e:
            print(f"fused_ln_mlp tile={tile}: FAILED {type(e).__name__}: {e}",
                  flush=True)
        finally:
            pallas_mlp._tile_m = orig_tile_m

    # XLA unfused chain for reference
    t = chain_time(
        lambda a: pallas_mlp.ln_mlp_reference(
            a, gamma, beta, w1, b1, w2, b2, x2, ls, 1e-6), x2) - base
    print(f"XLA ln_mlp_reference: {t:6.2f} ms", flush=True)

    # dwconv7 alone + assembled block, on the NHWC tensor
    base4 = chain_time(lambda a: a[..., :1, :1, :1], x)
    dw = nn.Conv(C, (7, 7), padding=[(3, 3)] * 2, feature_group_count=C,
                 dtype=jnp.bfloat16)
    vdw = dw.init(jax.random.PRNGKey(0), x)
    print(f"dwconv7: {chain_time(lambda a: dw.apply(vdw, a), x) - base4:6.2f} ms",
          flush=True)

    from segland_tpu.models.backbones.convnext import ConvNeXtBlock
    for fused in (True, False):
        blk = ConvNeXtBlock(C, fused_mlp=fused, dtype=jnp.bfloat16)
        v = blk.init(jax.random.PRNGKey(0), x)
        print(f"block fused={int(fused)}: "
              f"{chain_time(lambda a: blk.apply(v, a), x) - base4:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
