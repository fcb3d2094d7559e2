"""Decompose deeplab_pop int8's 104 ms/b16: bare resnet50-OS8 backbone vs
extract_features (backbone+ASPP) vs full forward (+POP head, +upsample),
each chained in-jit. int8 and bf16."""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.models.backbones import get_backbone
from segland_tpu.ops.resize import resize_bilinear
from segland_tpu.quant import calibrate, quantized_apply

B, TILE = 16, 1024
CHAIN, ITERS = 4, 3
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


img = jax.random.normal(jax.random.PRNGKey(1), (B, TILE, TILE, 3), jnp.float32)
base = chain_time(lambda a: a[..., :1, :1], img)
print(f"(baseline chain {base:.2f} ms)", flush=True)


def measure(name, op):
    print(f"{name}: {chain_time(op, img) - base:7.2f} ms", flush=True)


# bare backbone
bk = get_backbone("resnet50", dtype=jnp.bfloat16, os=8, dilated=True)
vb = jax.jit(lambda k, a: bk.init(k, a, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
measure("resnet50-OS8 bf16          ", lambda a: bk.apply(vb, a, train=False))
qb = quantized_apply(bk)
vbq = calibrate(bk, vb, [img], train=False)
measure("resnet50-OS8 int8          ", lambda a: qb(vbq, a, train=False))

# full model pieces
model = build_model("deeplab_pop", backbone="resnet50", n_base=7, dtype=jnp.bfloat16)
v = jax.jit(lambda k, a: model.init(k, a, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
q = quantized_apply(model)
vq = calibrate(model, v, [img])


def feats_int8(a):
    return q(vq, a, train=False, method=type(model).extract_features)


def full_int8(a):
    logits = q(vq, a, train=False)
    logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.uint8)


measure("deeplab feats int8 (bb+ASPP)", feats_int8)
measure("deeplab full int8 (+head+up)", full_int8)
