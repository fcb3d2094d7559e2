"""Measure the swin inter-block window-layout glue and its window-resident
replacement (VERDICT r2 item 2; reference swintransformer.py:193-249).

Current fused-attn block layout traffic per SW pair (models/backbones/swin.py):
  attn -> reverse -> unroll -> unpad -> [MLP] -> pad -> roll -> partition -> attn
The MLP is token-local (fused_ln_mlp flattens to (m, c)), so it can run in
WINDOW layout, letting the whole inter-block transform collapse to one
composite permutation windowed->windowed (no unpad/pad round trip; pad
tokens ride along, masked in attention by mask_tok):
  attn -> [MLP on windows] -> (reverse.roll.partition) -> attn

Chains measured at swin-s 1024^2-eval stage shapes via in-jit lax.scan
(single-op jits are dispatch-bound over the axon tunnel):
  A: the current spatial round trip (reverse,unroll,unpad,pad,roll,partition)
  B: the composite windowed->windowed permutation (reverse,roll,partition on
     the padded domain)
  A_mlp / B_mlp: same with the (identical-cost) MLP matmuls in the middle,
     checking XLA doesn't fuse differently around the kernel boundary.

Usage: python benchmarks/swin_glue_probe.py [A|B|mlp] [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

WS = 7
CHAIN = 8
ITERS = 3
DT = jnp.bfloat16
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())


def partition(x, ws=WS):
    b, hp, wp, c = x.shape
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def reverse(x, b, hp, wp, ws=WS):
    c = x.shape[-1]
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)


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


_BASE = {}


def measure(name, op, x):
    key = (x.shape, str(x.dtype))
    if key not in _BASE:
        _BASE[key] = chain_time(lambda a: a[..., :1, :1], x)
    ms = chain_time(op, x) - _BASE[key]
    print(f"{name}: {ms:7.3f} ms", flush=True)
    return ms


def stage_shapes(batch):
    # swin 1024^2 input -> stage resolutions 256/128/64 (stage3 unfused)
    for (h, c) in ((256, 96), (128, 192), (64, 384)):
        hp = ((h + WS - 1) // WS) * WS
        yield h, hp, c


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "A"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    shift = WS // 2
    for h, hp, c in stage_shapes(batch):
        nw = (hp // WS) ** 2
        wins = jax.random.normal(
            jax.random.PRNGKey(0), (batch * nw, WS * WS, c)).astype(DT)
        if which == "A":
            # current: windowed -> spatial(unpadded) -> windowed(shifted)
            def op(w):
                x = reverse(w, batch, hp, hp)
                x = x[:, :h, :h, :]                     # unpad
                x = jnp.pad(x, ((0, 0), (0, hp - h), (0, hp - h), (0, 0)))
                x = jnp.roll(x, (-shift, -shift), (1, 2))
                return partition(x)
            measure(f"A spatial-RT {h}^2x{c} b{batch}", op, wins)
        elif which == "B":
            # proposed: one composite windowed->windowed permutation
            def op(w):
                x = reverse(w, batch, hp, hp)
                x = jnp.roll(x, (-shift, -shift), (1, 2))
                return partition(x)
            measure(f"B win->win    {h}^2x{c} b{batch}", op, wins)
        elif which == "mlp":
            # with a 4x MLP between the permutes, both formulations: checks
            # the kernel boundary doesn't change the copy count
            w1 = (jax.random.normal(jax.random.PRNGKey(1), (c, 4 * c)) * 0.02).astype(DT)
            w2 = (jax.random.normal(jax.random.PRNGKey(2), (4 * c, c)) * 0.02).astype(DT)

            def mlp(t):
                m = t.reshape(-1, c)
                return (jax.nn.gelu(m @ w1, approximate=True) @ w2).reshape(t.shape)

            def op_a(w):
                x = reverse(w, batch, hp, hp)[:, :h, :h, :]
                x = mlp(x)
                x = jnp.pad(x, ((0, 0), (0, hp - h), (0, hp - h), (0, 0)))
                x = jnp.roll(x, (-shift, -shift), (1, 2))
                return partition(x)

            def op_b(w):
                w = mlp(w)
                x = reverse(w, batch, hp, hp)
                x = jnp.roll(x, (-shift, -shift), (1, 2))
                return partition(x)

            measure(f"A+mlp {h}^2x{c} b{batch}", op_a, wins)
            measure(f"B+mlp {h}^2x{c} b{batch}", op_b, wins)


if __name__ == "__main__":
    main()
