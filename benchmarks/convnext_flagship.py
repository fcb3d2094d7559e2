"""Round-2 flagship levers: convnext_pop batch sweep (bf16 fused), int8
re-measure on the POST-fusion model (the round-1 0.96x number predates the
fp32-layer-scale fix, fused LN+MLP, and the commuted decoder), and a
chain-probe stage breakdown to find the remaining HBM sinks.

Usage: python benchmarks/convnext_flagship.py {sweep|int8|stages}
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.ops.resize import resize_bilinear

TILE = 1024
probe = jax.jit(lambda o: o.astype(jnp.int32).sum())


def post(logits):
    logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.uint8)


def timed(f, v, img, iters=8, warmup=2):
    for _ in range(warmup):
        out = f(v, img)
    int(probe(out))
    t0 = time.time()
    for _ in range(iters):
        out = f(v, img)
    int(probe(out))
    return (time.time() - t0) / iters


def bf16_sweep():
    model = build_model("convnext_pop", backbone="convnext-t", n_base=7,
                        dtype=jnp.bfloat16, fused_mlp=True)
    v = jax.jit(lambda k, a: model.init(k, a, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    f = jax.jit(lambda v, x: post(model.apply(v, x, train=False)))
    for batch in (16, 24, 32):
        img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)
        dt = timed(f, v, img)
        print(f"convnext_pop bf16 fused b{batch}: {dt*1000:.1f} ms  "
              f"{batch/dt:.1f} tiles/s", flush=True)


def int8_remeasure():
    from segland_tpu.quant import calibrate, quantized_apply

    for batch in (16, 32):
        for fused in (True, False):
            model = build_model("convnext_pop", backbone="convnext-t", n_base=7,
                                dtype=jnp.bfloat16, fused_mlp=fused)
            v = jax.jit(lambda k, a: model.init(k, a, train=False))(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
            img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)
            q_apply = quantized_apply(model)
            f = jax.jit(lambda v, x: post(q_apply(v, x, train=False)))
            v_q = calibrate(model, v, [img])
            dt = timed(f, v_q, img)
            print(f"convnext_pop int8 fused={fused} b{batch}: {dt*1000:.1f} ms  "
                  f"{batch/dt:.1f} tiles/s", flush=True)


def stages():
    """Chain-probe the convnext-t stage blocks + decoder at batch-16 1024^2
    activation sizes, fused vs unfused, to find the residual HBM sinks."""
    import flax.linen as nn
    from segland_tpu.models.backbones.convnext import ConvNeXtBlock

    B, CHAIN, ITERS = 16, 8, 3

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

    # convnext-t stages at 1024^2 input: (H, C, depth)
    for (hh, c, depth) in ((256, 96, 3), (128, 192, 3), (64, 384, 9), (32, 768, 3)):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, hh, hh, c)).astype(jnp.bfloat16)
        for fused in (True, False):
            blk = ConvNeXtBlock(c, fused_mlp=fused, dtype=jnp.bfloat16)
            v = blk.init(jax.random.PRNGKey(0), x)
            measure(f"block {hh}^2x{c} fused={int(fused)} (x{depth}/stage)",
                    lambda a, m=blk, v=v: m.apply(v, a), x)
        # dwconv7x7 alone (the un-fused half of the block)
        dw = nn.Conv(c, (7, 7), padding=[(3, 3)] * 2, feature_group_count=c,
                     dtype=jnp.bfloat16)
        vdw = dw.init(jax.random.PRNGKey(0), x)
        measure(f"  dwconv7 {hh}^2x{c}", lambda a, m=dw, v=vdw: m.apply(v, a), x)


if __name__ == "__main__":
    {"sweep": bf16_sweep, "int8": int8_remeasure, "stages": stages}[sys.argv[1]]()
