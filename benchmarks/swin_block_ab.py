"""Round-5 A/B: two-kernel swin block (v2 attention + fused MLP) vs the
single-kernel whole-block fusion (ops/pallas_attn.swin_block_fused).

Per VERDICT r4 item 6: the v2 decomposition left the Pallas block-DMA path
(~120-175 GB/s vs XLA's ~819 on these shapes) paid TWICE per block — once by
the attention kernel's write + once by the MLP kernel's read/write of the
same [NW, N, C] activations.  One kernel per block halves that.

Chained W+SW pairs at swin-s serving shapes (the production kernels, not
probes), per stage; wblk sweep via SEGLAND_SWIN_V3_WBLK.

Usage: python benchmarks/swin_block_ab.py [stage0|stage1|stage2|stage3] [batch] [wblks]
       python benchmarks/swin_block_ab.py check   (CPU interpret exactness)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax
import jax.numpy as jnp
from jax import lax

_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

WS = 7
CHAIN = 8
ITERS = 5

probe = jax.jit(lambda t: t.astype(jnp.float32).sum())


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


def make_inputs(stage, batch, dt=jnp.bfloat16, h_override=None):
    from segland_tpu.models.backbones.swin import (_pad_token_mask,
                                                   _rel_pos_index,
                                                   _shift_regions)
    h, c, nh = {"stage0": (256, 96, 3), "stage1": (128, 192, 6),
                "stage2": (64, 384, 12), "stage3": (32, 768, 24)}[stage]
    if h_override is not None:
        h = h_override
    hp = ((h + WS - 1) // WS) * WS
    nw = (hp // WS) ** 2
    n = WS * WS
    shift = WS // 2
    hid = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    idx = _rel_pos_index(WS).reshape(-1)
    table = jax.random.normal(ks[2], ((2 * WS - 1) ** 2, nh)) * 0.02
    bias = jnp.asarray(table)[idx].reshape(n, n, nh).transpose(2, 0, 1)
    return dict(
        c=c, nh=nh, h=h, hp=hp,
        g_ln=jnp.ones((c,), jnp.float32), b_ln=jnp.zeros((c,), jnp.float32),
        wqkv=(jax.random.normal(ks[0], (c, 3 * c)) * 0.02).astype(dt),
        bqkv=jnp.zeros((3 * c,), dt),
        wproj=(jax.random.normal(ks[1], (c, c)) * 0.02).astype(dt),
        bproj=jnp.zeros((c,), dt),
        bias=bias[None].astype(dt),
        g2=jnp.ones((c,), jnp.float32), b2=jnp.zeros((c,), jnp.float32),
        w1=(jax.random.normal(ks[3], (c, hid)) * 0.02).astype(dt),
        b1v=jnp.zeros((hid,), dt),
        w2=(jax.random.normal(ks[4], (hid, c)) * 0.02).astype(dt),
        b2v=jnp.zeros((c,), dt),
        regions=jnp.asarray(_shift_regions(hp, hp, WS, shift)),
        mask0=jnp.asarray(_pad_token_mask(h, h, hp, hp, WS, 0)),
        mask1=jnp.asarray(_pad_token_mask(h, h, hp, hp, WS, shift)),
        wins=jax.random.normal(ks[5], (batch * nw, n, c)).astype(dt),
        geom=(h, h, hp, hp, WS))


def two_kernel_block(I, shift):
    from segland_tpu.ops.pallas_attn import swin_attn_section_fused
    from segland_tpu.ops.pallas_mlp import fused_ln_mlp

    mask = I["mask1"] if shift else I["mask0"]
    reg = I["regions"] if shift else None

    def op(w):
        a = swin_attn_section_fused(
            w, mask, I["g_ln"], I["b_ln"], I["wqkv"], I["bqkv"], I["wproj"],
            I["bproj"], I["bias"], I["nh"], regions=reg,
            geom=I["geom"] + (shift,))
        return fused_ln_mlp(a, I["g2"], I["b2"], I["w1"], I["b1v"], I["w2"],
                            I["b2v"])
    return op


def one_kernel_block(I, shift):
    from segland_tpu.ops.pallas_attn import swin_block_fused

    mask = I["mask1"] if shift else I["mask0"]
    reg = I["regions"] if shift else None

    def op(w):
        return swin_block_fused(
            w, mask, I["g_ln"], I["b_ln"], I["wqkv"], I["bqkv"], I["wproj"],
            I["bproj"], I["bias"], I["g2"], I["b2"], I["w1"], I["b1v"],
            I["w2"], I["b2v"], I["nh"], regions=reg, geom=I["geom"] + (shift,))
    return op


def pair(mk0, mk1):
    def op(w):
        return mk1(mk0(w))
    return op


def check():
    jax.config.update("jax_platforms", "cpu")
    os.environ["SEGLAND_PALLAS_INTERPRET"] = "1"
    from segland_tpu.ops.pallas_attn import block_reference

    for stage in ("stage0", "stage2"):
        I = make_inputs(stage, 1, dt=jnp.float32, h_override=26)
        x = I["wins"]
        for shift in (0, WS // 2):
            mask = I["mask1"] if shift else I["mask0"]
            reg = I["regions"] if shift else None
            ref = block_reference(
                x, mask, I["g_ln"], I["b_ln"], I["wqkv"], I["bqkv"],
                I["wproj"], I["bproj"], I["bias"], I["g2"], I["b2"], I["w1"],
                I["b1v"], I["w2"], I["b2v"], I["nh"], regions=reg)
            got = one_kernel_block(I, shift)(x)
            two = two_kernel_block(I, shift)(x)
            d = float(jnp.max(jnp.abs(got - ref)))
            d2 = float(jnp.max(jnp.abs(two - ref)))
            print(f"{stage} shift={shift}: one-kernel |d|={d:.2e} "
                  f"two-kernel |d|={d2:.2e}", flush=True)
            assert d < 2e-5 and d2 < 2e-5
    print("CHECK OK")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
        return
    stage = sys.argv[1] if len(sys.argv) > 1 else "stage0"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    wblks = (sys.argv[3].split(",") if len(sys.argv) > 3 else ["default"])
    print(f"devices: {jax.devices()}", flush=True)
    I = make_inputs(stage, batch)

    base = chain_time(lambda a: a[..., :1, :1], I["wins"])
    print(f"baseline {base:.3f} ms/link", flush=True)

    two = pair(two_kernel_block(I, 0), two_kernel_block(I, WS // 2))
    ms2 = chain_time(two, I["wins"]) - base
    print(f"{stage} b{batch} two-kernel pair: {ms2:7.3f} ms", flush=True)

    for wb in wblks:
        if wb == "default":
            os.environ.pop("SEGLAND_SWIN_V3_WBLK", None)
        else:
            os.environ["SEGLAND_SWIN_V3_WBLK"] = wb
        one = pair(one_kernel_block(I, 0), one_kernel_block(I, WS // 2))
        try:
            ms1 = chain_time(one, I["wins"]) - base
            print(f"{stage} b{batch} ONE-kernel pair wblk={wb}: {ms1:7.3f} ms "
                  f"({ms2 / ms1:.2f}x)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{stage} b{batch} ONE-kernel pair wblk={wb}: FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
