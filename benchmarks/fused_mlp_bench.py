"""Measure fused_mlp (Pallas LN+MLP) + layer-scale dtype fix on real TPU:
swin_pop / convnext_pop / lsk_pop at 1024^2 eval, fused vs unfused."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.ops.resize import resize_bilinear

TILE = 1024
ITERS = 5
probe = jax.jit(lambda o: o.astype(jnp.int32).sum())


def bench(model_name, backbone, batch, fused, fused_attn=False):
    model = build_model(model_name, backbone=backbone, n_base=7,
                        dtype=jnp.bfloat16, fused_mlp=fused, fused_attn=fused_attn)
    v = jax.jit(lambda k, a: model.init(k, a, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)

    def full(v, x):
        logits = model.apply(v, x, train=False)
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    f = jax.jit(full)
    t0 = time.time()
    for _ in range(2):
        out = f(v, img)
    int(probe(out))
    print(f"  (compile+warm {time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    for _ in range(ITERS):
        out = f(v, img)
    int(probe(out))
    dt = (time.time() - t0) / ITERS
    print(f"{model_name}/{backbone} b{batch} fused={fused} fattn={fused_attn}: "
          f"{dt*1000:.1f} ms/batch  {batch/dt:.1f} tiles/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "swin"
    if which == "swin":
        bench("swin_pop", "swin-s", 8, False)
        bench("swin_pop", "swin-s", 8, True)
    elif which == "swinattn":
        bench("swin_pop", "swin-s", 8, True, fused_attn=True)
    elif which == "swinattn16":
        bench("swin_pop", "swin-s", 16, True, fused_attn=True)
    elif which == "convnext":
        bench("convnext_pop", "convnext-t", 16, False)
        bench("convnext_pop", "convnext-t", 16, True)
    elif which == "lsk":
        bench("lsk_pop", "lsk-t", 16, False)
