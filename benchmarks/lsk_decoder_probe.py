"""Dissect lsk_pop's non-block cost: SimpleDecoder internals (laterals /
scale heads / resizes per level), stage LayerNorms, and patch embeds at
1024^2 b16 shapes.

Usage: python benchmarks/lsk_decoder_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from segland_tpu.models.decoders import SimpleDecoder

B = 16
CHAIN, ITERS = 4, 3
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())
key = jax.random.PRNGKey(0)

FILTERS = (32, 64, 160, 256)
HS = (256, 128, 64, 32)


def chain_time(op, *xs):
    @jax.jit
    def run(*xs):
        def body(c, i):
            xi = jax.tree_util.tree_map(lambda a: a + i.astype(a.dtype), c)
            out = op(*xi) if isinstance(xi, tuple) else op(xi)
            return c, out.astype(jnp.float32).mean()
        _, ys = lax.scan(body, xs, jnp.arange(CHAIN, dtype=jnp.float32))
        return ys.sum()
    for _ in range(2):
        out = run(*xs)
    float(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = run(*xs)
    float(probe(out))
    return (time.time() - t0) / (ITERS * CHAIN) * 1000


def main():
    feats = tuple(
        jax.random.normal(key, (B, h, h, c)).astype(jnp.bfloat16)
        for h, c in zip(HS, FILTERS))
    base = chain_time(lambda *f: f[0][..., :1, :1, :1], *feats)
    print(f"baseline (4-feat chain): {base:.2f} ms", flush=True)

    dec = SimpleDecoder(filters=FILTERS, out_features=192, dtype=jnp.bfloat16)
    v = dec.init(key, list(feats), train=False)
    t = chain_time(lambda *f: dec.apply(v, list(f), train=False), *feats) - base
    print(f"SimpleDecoder total: {t:6.2f} ms", flush=True)

    # per-level: lateral conv + bn/relu + scale head + resize
    import math as _m
    from segland_tpu.models.decoders import _scale_head, _bn
    from segland_tpu.ops.resize import resize_bilinear

    class Level(nn.Module):
        i: int
        ups: int

        @nn.compact
        def __call__(self, f):
            l = nn.Conv(192, (3, 3), padding=[(1, 1)] * 2, dtype=jnp.bfloat16,
                        name="conv")(f)
            l = nn.relu(_bn(False, jnp.bfloat16, name="bn")(l))
            h = _scale_head(l, 192, self.ups, False, jnp.bfloat16, "head")
            if h.shape[1:3] != (256, 256):
                h = resize_bilinear(h, (256, 256), align_corners=True)
            return h

    for i, f in enumerate(feats):
        ups = 0 if FILTERS[i] == FILTERS[0] else max(
            1, int(_m.log2(FILTERS[i]) - _m.log2(FILTERS[0])))
        lv = Level(i, ups)
        vl = lv.init(key, f, )
        bi = chain_time(lambda a: a[..., :1, :1, :1], f)
        t = chain_time(lambda a, lv=lv, vl=vl: lv.apply(vl, a,
                       mutable=False), f) - bi
        print(f"level {i} ({HS[i]}^2x{FILTERS[i]}, ups={ups}): {t:6.2f} ms", flush=True)

    # stage LayerNorms at each stage-out shape
    for h, c in zip(HS, FILTERS):
        x = jax.random.normal(key, (B, h, h, c)).astype(jnp.bfloat16)
        ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
        vn = ln.init(key, x)
        bi = chain_time(lambda a: a[..., :1, :1, :1], x)
        t = chain_time(lambda a: ln.apply(vn, a), x) - bi
        print(f"stage LN {h}^2x{c}: {t:6.2f} ms", flush=True)

    # patch embeds
    img = jax.random.normal(key, (B, 1024, 1024, 3)).astype(jnp.bfloat16)
    pe = nn.Conv(32, (7, 7), strides=(4, 4), padding=[(3, 3)] * 2, dtype=jnp.bfloat16)
    vpe = pe.init(key, img)
    bi = chain_time(lambda a: a[..., :1, :1, :1], img)
    t = chain_time(lambda a: pe.apply(vpe, a), img) - bi
    print(f"patch_embed1 7x7/s4 3->32: {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
