"""True per-op costs via in-jit scan chains (single-op jits are dispatch-bound
at ~5.3 ms over the axon tunnel — see stem_decomp_probe).

Each measurement runs `op` CHAIN times inside one jit, with a `+i` carry
perturbation to defeat CSE/hoisting; the `base` chain (perturbation + tiny
reduce only) is subtracted.
"""
import time
import sys
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

B, H, W = 8, 1024, 1024
CHAIN = 10
ITERS = 3
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


_BASE = {}


def measure(name, op, x):
    key = (x.shape, str(x.dtype))
    if key not in _BASE:
        _BASE[key] = chain_time(lambda a: a[..., :1, :1], x)
    ms = chain_time(op, x) - _BASE[key]
    print(f"{name}: {ms:6.2f} ms", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "stem"
    if which == "stem":
        from segland_tpu.ops.stem import s2d_conv

        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), jnp.float32)
        k4 = (jax.random.normal(jax.random.PRNGKey(2), (4, 4, 3, 96)) * 0.1)
        k7 = (jax.random.normal(jax.random.PRNGKey(3), (7, 7, 3, 64)) * 0.1)
        measure("cast bf16 [B,H,W,3]    ", lambda a: a.astype(jnp.bfloat16), x)
        measure("conv 4x4s4 (bf16)      ",
                lambda a: lax.conv_general_dilated(
                    a.astype(jnp.bfloat16), k4.astype(jnp.bfloat16), (4, 4), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
        measure("s2d_conv 4x4s4         ",
                lambda a: s2d_conv(a, k4, 4, 0, compute_dtype=jnp.bfloat16), x)
        measure("conv 7x7s2 (bf16)      ",
                lambda a: lax.conv_general_dilated(
                    a.astype(jnp.bfloat16), k7.astype(jnp.bfloat16), (2, 2),
                    [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
        measure("s2d_conv 7x7s2         ",
                lambda a: s2d_conv(a, k7, 2, 3, compute_dtype=jnp.bfloat16), x)
    elif which == "swinblock":
        from segland_tpu.models.backbones.swin import SwinBlock

        for fused in (False, True):
            for (hh, ww, c, nh, shift) in ((256, 256, 96, 3, 0), (256, 256, 96, 3, 3),
                                           (64, 64, 384, 12, 0), (64, 64, 384, 12, 3)):
                x = jax.random.normal(jax.random.PRNGKey(1), (B, hh, ww, c)).astype(jnp.bfloat16)
                blk = SwinBlock(c, nh, shift_size=shift, fused_mlp=fused,
                                fused_attn=fused, dtype=jnp.bfloat16)
                v = blk.init(jax.random.PRNGKey(0), x)
                measure(f"block {hh}x{ww}x{c} nh{nh} shift{shift} fused={fused}",
                        lambda a, blk=blk, v=v: blk.apply(v, a), x)
    elif which == "swinpieces":
        from segland_tpu.ops.pallas_mlp import fused_ln_mlp, ln_mlp_reference
        from segland_tpu.ops.pallas_attn import (attn_section_reference,
                                                 swin_attn_section_fused)
        from segland_tpu.models.backbones.swin import (_window_partition,
                                                       _window_reverse)

        hh = ww = 256
        c, nh, hid = 96, 3, 384
        x = jax.random.normal(jax.random.PRNGKey(1), (B, hh, ww, c)).astype(jnp.bfloat16)
        ks = jax.random.split(jax.random.PRNGKey(2), 8)
        gamma = jax.random.normal(ks[0], (c,)) * 0.1 + 1
        beta = jax.random.normal(ks[1], (c,)) * 0.1
        w1 = jax.random.normal(ks[2], (c, hid)) * 0.05
        b1 = jax.random.normal(ks[3], (hid,)) * 0.01
        w2 = jax.random.normal(ks[4], (hid, c)) * 0.05
        b2 = jax.random.normal(ks[5], (c,)) * 0.01
        measure("LN+MLP kernel  256^2x96", lambda a: fused_ln_mlp(
            a, gamma, beta, w1, b1, w2, b2), x)
        measure("LN+MLP XLA     256^2x96", lambda a: ln_mlp_reference(
            a.reshape(-1, c), gamma, beta, w1, b1, w2, b2).reshape(a.shape), x)

        xp = jax.random.normal(jax.random.PRNGKey(3), (B, 259, 259, c)).astype(jnp.bfloat16)
        measure("partition+reverse 259^2", lambda a: _window_reverse(
            _window_partition(a, 7) * 1.0001, 7, B, 259, 259), xp)

        nw = (259 // 7) ** 2 * B
        xw = jax.random.normal(jax.random.PRNGKey(4), (nw, 49, c)).astype(jnp.bfloat16)
        wqkv = jax.random.normal(ks[6], (c, 3 * c)) * 0.05
        bqkv = jnp.zeros((3 * c,))
        wproj = jax.random.normal(ks[7], (c, c)) * 0.05
        bproj = jnp.zeros((c,))
        bias = (jax.random.normal(jax.random.PRNGKey(5), (1, nh, 49, 49)) * 0.2
                ).astype(jnp.bfloat16)
        mask = jnp.ones((1, 49))
        measure("attn-section kernel (bias x1)", lambda a: swin_attn_section_fused(
            a, mask, gamma, beta, wqkv, bqkv, wproj, bproj, bias, nh), xw)
        measure("attn-section XLA    (bias x1)", lambda a: attn_section_reference(
            a, mask, gamma, beta, wqkv, bqkv, wproj, bproj, bias, nh), xw)


if __name__ == "__main__":
    main()
