"""Dissect seghr_pop/hr-w32 cost at 1024^2 b8 eval shapes (118.9 ms whole
model, 67.9 t/s — slowest family): stem+stage1, per-branch BasicBlock
chains, one full fuse lattice per stage width, transitions, and the
parameterless HRFPN decoder concat + POP head.

Usage: python benchmarks/hrnet_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from segland_tpu.models.backbones.hrnet import (
    HighResolutionNet, _Ops, _basic_block, _bottleneck, _hr_module)

B, CHAIN, ITERS = 8, 4, 3
DT = jnp.bfloat16
probe = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).sum())
key = jax.random.PRNGKey(0)
F = (32, 64, 128, 256)
HS = (256, 128, 64, 32)


def chain_time(op, *xs):
    @jax.jit
    def run(*xs):
        def body(c, i):
            c1 = jax.tree_util.tree_map(lambda a: a + i.astype(a.dtype), c)
            out = op(*c1) if isinstance(c1, tuple) else op(c1)
            red = sum(l.astype(jnp.float32).mean()
                      for l in jax.tree_util.tree_leaves(out))
            return c, red
        _, ys = lax.scan(body, xs if len(xs) > 1 else xs[0],
                         jnp.arange(CHAIN, dtype=jnp.float32))
        return ys.sum()
    for _ in range(2):
        out = run(*xs)
    float(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = run(*xs)
    float(probe(out))
    return (time.time() - t0) / (ITERS * CHAIN) * 1000


class Branch(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        ops = _Ops(self, False, DT)
        for k in range(4):
            x = _basic_block(ops, x, self.ch, f"b_{k}")
        return x


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        ops = _Ops(self, False, DT)
        x = ops.cbr(x, 64, 3, 2, "stem1")
        x = ops.cbr(x, 64, 3, 2, "stem2")
        for k in range(4):
            x = _bottleneck(ops, x, 64, f"layer1_{k}", has_down=(k == 0))
        return x


class Fuse(nn.Module):
    n: int

    @nn.compact
    def __call__(self, *xs):
        ops = _Ops(self, False, DT)
        return _hr_module(ops, list(xs), F[: self.n], "m")


def t(mod, *xs):
    v = mod.init(jax.random.PRNGKey(0), *xs)
    return chain_time(lambda *a: mod.apply(v, *a, mutable=False), *xs)


def main():
    img = jax.random.normal(key, (B, 1024, 1024, 3)).astype(DT)
    print(f"stem+stage1 (1024^2->256^2x256): {t(Stem(), img):6.2f} ms", flush=True)

    branches = []
    for i in range(4):
        x = jax.random.normal(key, (B, HS[i], HS[i], F[i])).astype(DT)
        branches.append(x)
        print(f"branch{i} 4xBasicBlock @{HS[i]}^2x{F[i]}: {t(Branch(F[i]), x):6.2f} ms",
              flush=True)

    for n in (2, 3, 4):
        # full module = branches + fuse; subtract branch time to isolate fuse
        tm = t(Fuse(n), *branches[:n])
        print(f"hr_module n={n} (branches+fuse): {tm:6.2f} ms", flush=True)

    # decoder: upsample branches 1..3 to 256^2, concat 480ch (HRFPN)
    def dec(*xs):
        from segland_tpu.ops.resize import resize_bilinear
        ups = [xs[0]] + [resize_bilinear(x, (256, 256), align_corners=True)
                         for x in xs[1:]]
        return jnp.concatenate(ups, axis=-1)
    print(f"HRFPN concat->480ch@256^2: {chain_time(dec, *branches):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
