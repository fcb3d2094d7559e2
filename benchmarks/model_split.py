"""Model-phase split for any GFSS family on the real TPU: backbone vs
decoder vs POP head vs eval epilogue at 1024^2 eval shapes.

Usage: python benchmarks/model_split.py <model> <backbone> <batch> [fused]
e.g.   python benchmarks/model_split.py lsk_pop lsk-t 16
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.ops.resize import resize_bilinear

TILE = 1024
ITERS = 20
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


def main():
    model_name, backbone, batch = sys.argv[1], sys.argv[2], int(sys.argv[3])
    fused = "fused" in sys.argv[4:]
    kw = {"fused_mlp": True, "fused_attn": True} if fused else {}
    model = build_model(model_name, backbone=backbone, n_base=7,
                        dtype=jnp.bfloat16, **kw)
    v = jax.jit(lambda k, a: model.init(k, a, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)

    fb = jax.jit(lambda v, x: model.apply(v, x, train=False,
                                          method=type(model).extract_features))
    t_feat = timeit(fb, v, img)
    print(f"{model_name}/{backbone} b{batch}: backbone+decoder {t_feat:.1f} ms", flush=True)

    fbase = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t_base = timeit(fbase, v, img)
    print(f"  +POP head (model-res logits): {t_base:.1f} ms "
          f"(POP ~{t_base - t_feat:.1f})", flush=True)

    def full(v, x):
        logits = model.apply(v, x, train=False)
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE),
                                 align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    t_full = timeit(jax.jit(full), v, img)
    print(f"  +XLA upsample+argmax: {t_full:.1f} ms (epilogue ~{t_full - t_base:.1f})",
          flush=True)

    from segland_tpu.ops.fused_epilogue import upsample_argmax, upsample_argmax_supported
    logits_shape = jax.eval_shape(lambda v, x: model.apply(v, x, train=False), v, img)
    if upsample_argmax_supported(logits_shape.shape, (TILE, TILE)):
        def fullf(v, x):
            return upsample_argmax(model.apply(v, x, train=False), (TILE, TILE))
        t_ff = timeit(jax.jit(fullf), v, img)
        print(f"  +fused upsample+argmax: {t_ff:.1f} ms (epilogue ~{t_ff - t_base:.1f}) "
              f"-> {batch / t_ff * 1000:.1f} t/s", flush=True)
    else:
        print(f"  fused epilogue NOT supported for logits {logits_shape.shape}", flush=True)


if __name__ == "__main__":
    main()
