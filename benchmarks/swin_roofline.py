"""Roofline closure for swin_pop/swin-s serving (VERDICT r2 item 2).

Per fused stage (0-2), measures each component of a 2-block (W-MSA+SW-MSA)
pair SEPARATELY via in-jit scan chains, so the sum can be checked against
the measured pair cost (benchmarks/swin_stage_variants.py fboth) and the
full model (benchmarks/swin_profile.py fused):

  attn  — swin_attn_section_fused on pre-partitioned windows, x2 blocks
          (one with shift regions), NO layout glue
  mlp   — fused_ln_mlp on the spatial tensor, x2
  glue  — the spatial round trip (reverse/unpad/pad/[roll]/partition) x2

Also prints the HBM-bytes bound for each component at 800 GB/s (v5e
sustained) — the gap to it is the roofline statement.

Usage: python benchmarks/swin_roofline.py [batch]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from segland_tpu.ops.pallas_attn import swin_attn_section_fused
from segland_tpu.ops.pallas_mlp import fused_ln_mlp
from segland_tpu.models.backbones.swin import (_rel_pos_index, _shift_regions,
                                               _pad_token_mask,
                                               _window_partition,
                                               _window_reverse)

WS = 7
CHAIN = 6
ITERS = 3
DT = jnp.bfloat16
HBM_GBPS = 800.0
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


def measure(name, op, x, bytes_moved=None):
    key = (x.shape, str(x.dtype))
    if key not in _BASE:
        _BASE[key] = chain_time(lambda a: a[..., :1, :1], x)
    ms = chain_time(op, x) - _BASE[key]
    bound = ""
    if bytes_moved is not None:
        bound = f"  (HBM bound {bytes_moved / HBM_GBPS / 1e6:.2f} ms)"
    print(f"{name}: {ms:7.3f} ms{bound}", flush=True)
    return ms


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = jax.random.PRNGKey(0)
    for (h, c, nh) in ((256, 96, 3), (128, 192, 6), (64, 384, 12)):
        hp = ((h + WS - 1) // WS) * WS
        nw = (hp // WS) ** 2
        n = WS * WS
        shift = WS // 2
        hd = c // nh

        # params
        ks = jax.random.split(rng, 8)
        g_ln = jnp.ones((c,), jnp.float32)
        b_ln = jnp.zeros((c,), jnp.float32)
        wqkv = (jax.random.normal(ks[0], (c, 3 * c)) * 0.02).astype(DT)
        bqkv = jnp.zeros((3 * c,), DT)
        wproj = (jax.random.normal(ks[1], (c, c)) * 0.02).astype(DT)
        bproj = jnp.zeros((c,), DT)
        table = jax.random.normal(ks[2], ((2 * WS - 1) ** 2, nh)) * 0.02
        idx = _rel_pos_index(WS).reshape(-1)
        bias = jnp.asarray(table)[idx].reshape(n, n, nh).transpose(2, 0, 1)
        bias_arr = bias[None].astype(DT)
        regions = jnp.asarray(_shift_regions(hp, hp, WS, shift))
        mask0 = jnp.asarray(_pad_token_mask(h, h, hp, hp, WS, 0))
        mask1 = jnp.asarray(_pad_token_mask(h, h, hp, hp, WS, shift))
        w1 = (jax.random.normal(ks[3], (c, 4 * c)) * 0.02).astype(DT)
        b1 = jnp.zeros((4 * c,), DT)
        w2 = (jax.random.normal(ks[4], (4 * c, c)) * 0.02).astype(DT)
        b2 = jnp.zeros((c,), DT)
        gamma2 = jnp.ones((c,), jnp.float32)
        beta2 = jnp.zeros((c,), jnp.float32)

        wins = jax.random.normal(ks[5], (batch * nw, n, c)).astype(DT)
        xsp = jax.random.normal(ks[6], (batch, h, h, c)).astype(DT)

        tok_bytes = batch * nw * n * c * 2  # window-layout tensor bytes
        sp_bytes = batch * h * h * c * 2

        def attn_pair(w):
            y = swin_attn_section_fused(w, mask0, g_ln, b_ln, wqkv, bqkv,
                                        wproj, bproj, bias_arr, nh, eps=1e-5)
            return swin_attn_section_fused(y, mask1, g_ln, b_ln, wqkv, bqkv,
                                           wproj, bproj, bias_arr, nh,
                                           eps=1e-5, regions=regions)

        # attn kernel reads x + writes out per block: 2 passes x2 blocks
        measure(f"attn2 {h}^2x{c} b{batch}", attn_pair, wins,
                bytes_moved=4 * tok_bytes)

        def mlp_pair(x):
            y = fused_ln_mlp(x, gamma2, beta2, w1, b1, w2, b2, eps=1e-5)
            return fused_ln_mlp(y, gamma2, beta2, w1, b1, w2, b2, eps=1e-5)

        measure(f"mlp2  {h}^2x{c} b{batch}", mlp_pair, xsp,
                bytes_moved=4 * sp_bytes)

        def glue_pair(w):
            # W-block exit -> entry of SW block -> exit -> entry of next W
            x = _window_reverse(w, WS, batch, hp, hp)[:, :h, :h, :]
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, hp - h), (0, 0)))
            x = jnp.roll(x, (-shift, -shift), (1, 2))
            w = _window_partition(x, WS)
            x = _window_reverse(w, WS, batch, hp, hp)
            x = jnp.roll(x, (shift, shift), (1, 2))[:, :h, :h, :]
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, hp - h), (0, 0)))
            return _window_partition(x, WS)

        measure(f"glue2 {h}^2x{c} b{batch}", glue_pair, wins,
                bytes_moved=8 * tok_bytes)


if __name__ == "__main__":
    main()
