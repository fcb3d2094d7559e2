"""Stage-level profile of swin_pop/swin-s at 1024^2 eval on the real TPU.

Times swin backbones with truncated depth tuples (prefix sums give per-stage
cost), then the full swin_pop model (difference = decoder + POP + upsample),
then isolated LN+MLP / attention stacks at each stage's dims.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")

from segland_tpu.models.backbones.swin import SwinTransformer, SwinBlock
from segland_tpu.models import build_model
from segland_tpu.ops.resize import resize_bilinear

B = 8
TILE = 1024
ITERS = 5
probe = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).sum())


def timeit(fn, *args):
    for _ in range(2):
        out = fn(*args)
    float(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(probe(out))
    return (time.time() - t0) / ITERS * 1000


def bench_module(mod, x, tag, **apply_kw):
    variables = jax.jit(lambda k, a: mod.init(k, a, **apply_kw))(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda v, a: mod.apply(v, a, **apply_kw))
    ms = timeit(f, variables, x)
    print(f"{tag}: {ms:.1f} ms", flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}", flush=True)
    img = jax.random.normal(jax.random.PRNGKey(1), (B, TILE, TILE, 3), jnp.float32)

    fused = "fused" in sys.argv
    # truncated-depth backbones (swin-s = depths (2,2,18,2), heads (3,6,12,24))
    heads = (3, 6, 12, 24)
    cum = []
    for k in range(1, 5):
        depths = (2, 2, 18, 2)[:k]
        mod = SwinTransformer(depths=depths, num_heads=heads[:k], embed_dim=96,
                              fused_mlp=fused, fused_attn=fused,
                              dtype=jnp.bfloat16)
        ms = bench_module(mod, img, f"backbone stages0..{k - 1}")
        cum.append(ms)
    for i in range(3, 0, -1):
        print(f"  -> stage{i} alone: {cum[i] - cum[i - 1]:.1f} ms", flush=True)

    # full model
    model = build_model("swin_pop", backbone="swin-s", n_base=7, dtype=jnp.bfloat16,
                        fused_mlp=fused, fused_attn=fused)
    v = jax.jit(lambda k, a: model.init(k, a, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    def full(v, x):
        logits = model.apply(v, x, train=False)
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    ms_full = timeit(jax.jit(full), v, img)
    print(f"full swin_pop (+decoder/POP/upsample): {ms_full:.1f} ms "
          f"(head part ~{ms_full - cum[-1]:.1f} ms)", flush=True)

    # isolated pieces at each stage dims: (H, W, C, nh, n_blocks)
    stage_dims = [(256, 256, 96, 3, 2), (128, 128, 192, 6, 2),
                  (64, 64, 384, 12, 18), (32, 32, 768, 24, 2)]

    class MLPOnly(nn.Module):
        c: int
        n: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16, name=f"ln{i}")(x)
                y = nn.Dense(4 * self.c, dtype=jnp.bfloat16, name=f"fc1_{i}")(y)
                y = nn.gelu(y, approximate=False)
                y = nn.Dense(self.c, dtype=jnp.bfloat16, name=f"fc2_{i}")(y)
                x = x + y
            return x

    for (h, w, c, nh, n) in stage_dims:
        x = jax.random.normal(jax.random.PRNGKey(2), (B, h, w, c)).astype(jnp.bfloat16)
        bench_module(MLPOnly(c, n), x, f"stage {h}x{w}x{c}: {n}x LN+MLP")
        # attention-section cost = per-stage block cost minus the LN+MLP cost


if __name__ == "__main__":
    main()
