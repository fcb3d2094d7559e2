"""Per-stage SwinBlock config ablation on the real TPU.

For each stage of swin-s at 1024^2 eval (b8), times a 2-block stack
(unshifted + shifted, like the real stages) under:
  xla        - plain flax attention + MLP
  fmlp       - fused LN+MLP kernel, XLA attention
  fboth      - fused attention section + fused LN+MLP
Used to decide per-stage fused-attention gating (stage0 was measured at
17 ms/block fully fused vs ~2 ms/block at stage2 — benchmarks/swin_profile.py).
"""
import sys
import time

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")

from segland_tpu.models.backbones.swin import SwinBlock

B = 8
ITERS = 10
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())


def timeit(fn, *args):
    for _ in range(2):
        out = fn(*args)
    float(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(probe(out))
    return (time.time() - t0) / ITERS * 1000


class Stack(nn.Module):
    dim: int
    heads: int
    fused_mlp: bool
    fused_attn: bool

    @nn.compact
    def __call__(self, x):
        for i, shift in enumerate((0, 3)):
            x = SwinBlock(self.dim, self.heads, shift_size=shift,
                          fused_mlp=self.fused_mlp, fused_attn=self.fused_attn,
                          dtype=jnp.bfloat16, name=f"b{i}")(x, train=False)
        return x


def main():
    print(f"devices: {jax.devices()}", flush=True)
    stage_dims = [(256, 256, 96, 3), (128, 128, 192, 6),
                  (64, 64, 384, 12), (32, 32, 768, 24)]
    for (h, w, c, nh) in stage_dims:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, c)).astype(jnp.bfloat16)
        for tag, fm, fa in (("xla", False, False), ("fmlp", True, False),
                            ("fboth", True, True)):
            mod = Stack(c, nh, fm, fa)
            v = jax.jit(mod.init)(jax.random.PRNGKey(1), x)
            f = jax.jit(lambda v, a, m=mod: m.apply(v, a))
            ms = timeit(f, v, x)
            print(f"stage {h}x{w}x{c} nh={nh} {tag}: {ms:.2f} ms (2 blocks)",
                  flush=True)


if __name__ == "__main__":
    main()
