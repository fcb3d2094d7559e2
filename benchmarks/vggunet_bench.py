"""Time vggunet_pop at 1024^2 eval on the real TPU (bf16; the fused
epilogue gate routes its factor-1 logits to the XLA argmax fallback).

Reference analog: networks/vggunet_pop.py:51-81 (full-res 64-ch UNet
features -> POP head), eval protocol of eval_base.py:162-191."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.ops.resize import resize_bilinear

TILE = 1024


def bench(batch, iters=8):
    model = build_model("vggunet_pop", backbone="vgg16bn-unet", n_base=7,
                        dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), img0)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3),
                            jnp.float32)

    def post(logits):
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE),
                                 align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    f = jax.jit(lambda v, x: post(model.apply(v, x, train=False)))
    probe = jax.jit(lambda o: o.astype(jnp.int32).sum())
    for _ in range(2):
        out = f(v, img)
    int(probe(out))
    t0 = time.time()
    for _ in range(iters):
        out = f(v, img)
    int(probe(out))
    dt = (time.time() - t0) / iters
    print(f"vggunet_pop/vgg16bn-unet bf16 b{batch}: {dt*1000:.1f} ms/batch  "
          f"{batch/dt:.1f} tiles/s", flush=True)


if __name__ == "__main__":
    for b in [int(a) for a in (sys.argv[1:] or ["4"])]:
        bench(b)
