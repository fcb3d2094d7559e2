"""Super-window grouping sweep for the fused Swin attention section.

2-block stacks (unshifted + shifted) at swin-s stage dims, b8 1024^2 eval,
fused MLP + fused attention, attn_group in {1,2,4,8}."""
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
    group: int

    @nn.compact
    def __call__(self, x):
        for i, shift in enumerate((0, 3)):
            x = SwinBlock(self.dim, self.heads, shift_size=shift,
                          fused_mlp=True, fused_attn=True,
                          attn_group=self.group,
                          dtype=jnp.bfloat16, name=f"b{i}")(x, train=False)
        return x


def main():
    print(f"devices: {jax.devices()}", flush=True)
    stage_dims = [(256, 256, 96, 3), (128, 128, 192, 6), (64, 64, 384, 12)]
    for (h, w, c, nh) in stage_dims:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, c)).astype(jnp.bfloat16)
        for g in (1, 2, 4, 8):
            mod = Stack(c, nh, g)
            v = jax.jit(mod.init)(jax.random.PRNGKey(1), x)
            f = jax.jit(lambda v, a, m=mod: m.apply(v, a))
            ms = timeit(f, v, x)
            print(f"stage {h}x{w}x{c} nh={nh} g={g}: {ms:.2f} ms (2 blocks)",
                  flush=True)


if __name__ == "__main__":
    main()
