"""Dissect the lsk_pop family cost (101.9 t/s at 1024^2 b16 eval, no fused
kernels wired yet): per-stage LSKStageBlock totals plus the attention part,
the conv-MLP part, and the raw dwconvs, via the in-jit chain protocol.

Usage: python benchmarks/lsk_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from segland_tpu.models.backbones.lsknet import LSKStageBlock, LSKAttention

B, CHAIN, ITERS = 16, 8, 3
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


class MLPOnly(nn.Module):
    dim: int
    mlp_ratio: float
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="mlp_fc1")(x)
        h = nn.Conv(hidden, (3, 3), padding=[(1, 1)] * 2, feature_group_count=hidden,
                    dtype=self.dtype, name="mlp_dwconv")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="mlp_fc2")(h)


def main():
    key = jax.random.PRNGKey(0)
    # lsk-t stages: (H, C, ratio, depth) at 1024^2 input
    for hh, c, ratio, depth in ((256, 32, 8, 3), (128, 64, 8, 3),
                                (64, 160, 4, 5), (32, 256, 4, 2)):
        x = jax.random.normal(key, (B, hh, hh, c)).astype(jnp.bfloat16)
        base = chain_time(lambda a: a[..., :1, :1, :1], x)

        blk = LSKStageBlock(c, ratio, drop=0.0, dtype=jnp.bfloat16)
        v = blk.init(jax.random.PRNGKey(0), x, train=False)
        t_blk = chain_time(lambda a: blk.apply(v, a, train=False,
                                               mutable=False), x) - base

        attn = LSKAttention(c, dtype=jnp.bfloat16)
        va = attn.init(jax.random.PRNGKey(0), x)
        t_attn = chain_time(lambda a: attn.apply(va, a), x) - base

        mlp = MLPOnly(c, ratio)
        vm = mlp.init(jax.random.PRNGKey(0), x)
        t_mlp = chain_time(lambda a: mlp.apply(vm, a), x) - base

        dw3 = nn.Conv(c * int(ratio), (3, 3), padding=[(1, 1)] * 2,
                      feature_group_count=c * int(ratio), dtype=jnp.bfloat16)
        xh = jax.random.normal(key, (B, hh, hh, c * int(ratio))).astype(jnp.bfloat16)
        baseh = chain_time(lambda a: a[..., :1, :1, :1], xh)
        vd = dw3.init(jax.random.PRNGKey(0), xh)
        t_dw3 = chain_time(lambda a: dw3.apply(vd, a), xh) - baseh

        print(f"stage {hh}^2x{c} r{ratio} x{depth}: block {t_blk:6.2f} | "
              f"attn {t_attn:6.2f} | mlp {t_mlp:6.2f} | dw3x3@{c*int(ratio)} "
              f"{t_dw3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
