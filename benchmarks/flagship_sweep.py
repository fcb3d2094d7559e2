"""Batch sweep for the serving flagship (deeplab_pop int8) + LSK block
stage profile (chain probe) to find lsk_pop's time sink."""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.ops.resize import resize_bilinear
from segland_tpu.quant import calibrate, quantized_apply

TILE = 1024
probe = jax.jit(lambda o: o.astype(jnp.int32).sum())


def bench_int8(model_name, backbone, batch, iters=8):
    model = build_model(model_name, backbone=backbone, n_base=7, dtype=jnp.bfloat16)
    v = jax.jit(lambda k, a: model.init(k, a, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)

    def post(logits):
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    q_apply = quantized_apply(model)
    f = jax.jit(lambda v, x: post(q_apply(v, x, train=False)))
    v_q = calibrate(model, v, [img])
    for _ in range(2):
        out = f(v_q, img)
    int(probe(out))
    t0 = time.time()
    for _ in range(iters):
        out = f(v_q, img)
    int(probe(out))
    dt = (time.time() - t0) / iters
    print(f"{model_name}/{backbone} int8 b{batch}: {dt*1000:.1f} ms  "
          f"{batch/dt:.1f} tiles/s", flush=True)


def lsk_profile():
    from segland_tpu.models.backbones.lsknet import (LSKAttention,
                                                     LSKStageBlock)
    import flax.linen as nn

    B = 16
    CHAIN, ITERS = 8, 3

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

    base = {}

    def measure(name, op, x):
        key = (x.shape, str(x.dtype))
        if key not in base:
            base[key] = chain_time(lambda a: a[..., :1, :1], x)
        print(f"{name}: {chain_time(op, x) - base[key]:6.2f} ms", flush=True)

    # lsk-t stages at 1024^2 input: (H, C, depth, mlp_ratio)
    for (hh, c, depth, mr) in ((256, 32, 3, 8), (128, 64, 3, 8),
                               (64, 160, 5, 4), (32, 256, 2, 4)):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, hh, hh, c)).astype(jnp.bfloat16)
        blk = LSKStageBlock(c, mr, dtype=jnp.bfloat16)
        v = blk.init(jax.random.PRNGKey(0), x)
        measure(f"lsk block {hh}^2x{c} (x{depth} per stage)",
                lambda a, blk=blk, v=v: blk.apply(v, a), x)
        attn = LSKAttention(c, dtype=jnp.bfloat16)
        va = attn.init(jax.random.PRNGKey(0), x)
        measure(f"  lsk attn-only {hh}^2x{c}",
                lambda a, m=attn, v=va: m.apply(v, a), x)


if __name__ == "__main__":
    if sys.argv[1] == "sweep":
        for b in (16, 24, 32):
            bench_int8("deeplab_pop", "resnet50", b)
    elif sys.argv[1] == "lsk":
        lsk_profile()
