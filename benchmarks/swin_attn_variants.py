"""Locate the fused attention-section time (VERDICT r2 item 2).

swin_roofline.py put the stage-0 W+SW attention pair at 24.5 ms (b16)
against a ~1 ms HBM bound.  This probe sweeps a parameterized copy of
ops/pallas_attn._attn_section_kernel to find where the time sits:

  wblk     — grid-step count (default budget caps at 32; each step ~5 us)
  score_dt — fp32 q/k score dots (6-pass MXU) vs bf16 (1-pass)
  ablate   — 'softmax' (exp->identity), 'ln' (skip fp32 LN), 'attn'
             (ctx := q, isolates qkv+proj+glue), 'proj1' (assembled
             single-matmul projection instead of per-head K=32 dots)

Usage: python benchmarks/swin_attn_variants.py [stage0|stage1|stage2] [batch]
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from segland_tpu.models.backbones.swin import (_rel_pos_index, _shift_regions,
                                               _pad_token_mask)

WS = 7
CHAIN = 6
ITERS = 3
DT = jnp.bfloat16
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())


def _kernel(x_ref, mask_ref, region_ref, gamma_ref, beta_ref, wqkv_ref,
            bqkv_ref, wproj_ref, bproj_ref, bias_ref, out_ref, *,
            num_heads, head_dim, eps, has_region, score_dt, ablate):
    wblk, n, c = x_ref.shape
    hd = head_dim
    scale = hd ** -0.5
    cdt = x_ref.dtype

    if ablate == "ln":
        y = x_ref[:] * mask_ref[:].astype(cdt)
    else:
        x = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
        y = (x - mu) * lax.rsqrt(var + eps)
        y = y * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
        y = y * mask_ref[:].astype(jnp.float32)
        y = y.astype(cdt)

    qkv = lax.dot_general(
        y.reshape(wblk * n, c), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt) + bqkv_ref[0].astype(cdt)
    qkv = qkv.reshape(wblk, n, 3 * c)

    if has_region:
        r = region_ref[:].astype(jnp.float32)
        pair = r - r.reshape(r.shape[0], 1, n)
        shift_pen = jnp.where(pair != 0.0, -100.0, 0.0)

    if ablate == "io":
        # LN + residual + read/write only: the io/grid-overhead floor
        out_ref[:] = x_ref[:] + y
        return

    ctxs = []
    acc = jnp.zeros((wblk * n, c), jnp.float32)
    for h in range(num_heads):
        q = qkv[:, :, h * hd : (h + 1) * hd]
        k = qkv[:, :, c + h * hd : c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd : 2 * c + (h + 1) * hd]
        if ablate == "attn":
            ctx = q
        else:
            if score_dt == jnp.float32:
                q = q.astype(jnp.float32)
                k = k.astype(jnp.float32)
            attn = lax.dot_general(
                q * jnp.asarray(scale, q.dtype), k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            attn = attn + bias_ref[0, h][None].astype(jnp.float32)
            if has_region:
                attn = attn + shift_pen
            if ablate == "softmax":
                attn = attn * 0.001
            elif ablate == "nomax":
                # skip the max-subtraction: scores are bounded post-LN;
                # measures the max-reduce + broadcast-subtract share
                attn = jnp.exp(attn)
                attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
            elif ablate == "bf16sm":
                attn = attn - jnp.max(attn, axis=-1, keepdims=True)
                attn = jnp.exp(attn.astype(jnp.bfloat16))
                attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
            else:
                attn = attn - jnp.max(attn, axis=-1, keepdims=True)
                attn = jnp.exp(attn)
                attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
            ctx = lax.dot_general(
                attn.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        if ablate == "proj1":
            ctxs.append(ctx)
        else:
            acc = acc + lax.dot_general(
                ctx.reshape(wblk * n, hd), wproj_ref[h * hd : (h + 1) * hd, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if ablate == "proj1":
        full = jnp.concatenate(ctxs, axis=-1).reshape(wblk * n, c)
        acc = lax.dot_general(full, wproj_ref[:],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = acc.astype(cdt) + bproj_ref[0].astype(cdt)
    out_ref[:] = x_ref[:] + out.reshape(wblk, n, c)


def section(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj, bproj,
            bias, num_heads, eps=1e-5, wblk=32, score_dt=jnp.float32,
            ablate="none"):
    nw, n, c = x_win.shape
    hd = c // num_heads
    cdt = x_win.dtype
    itemsize = x_win.dtype.itemsize
    has_region = regions is not None

    def ceil_to(v, m):
        return -(-v // m) * m

    n8 = ceil_to(n, 16 if itemsize == 2 else 8)
    if n8 != n:
        x_win = jnp.pad(x_win, ((0, 0), (0, n8 - n), (0, 0)))
        mask_tok = jnp.pad(mask_tok, ((0, 0), (0, n8 - n)))
        keymask = jnp.where(jnp.arange(n8) >= n, -1e9, 0.0).astype(jnp.float32)
        bias = jnp.pad(bias.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, n8 - n), (0, n8 - n)))
        bias = (bias + keymask[None, None, None, :]).astype(cdt)
        if has_region:
            regions = jnp.pad(regions, ((0, 0), (0, n8 - n)),
                              constant_values=-1.0)
        n_real, n = n, n8
    else:
        n_real = n

    if mask_tok.shape[0] > 1:
        mask_tok = jnp.tile(mask_tok, (nw // mask_tok.shape[0], 1))
    if has_region and regions.shape[0] > 1:
        regions = jnp.tile(regions, (nw // regions.shape[0], 1))

    grid = (-(-nw // wblk),)
    nw_padded = grid[0] * wblk
    if nw_padded != nw:
        x_win = jnp.pad(x_win, ((0, nw_padded - nw), (0, 0), (0, 0)))
        if mask_tok.shape[0] > 1:
            mask_tok = jnp.pad(mask_tok, ((0, nw_padded - nw), (0, 0)))
        if has_region and regions.shape[0] > 1:
            regions = jnp.pad(regions, ((0, nw_padded - nw), (0, 0)))

    bias_spec = pl.BlockSpec((1, num_heads, n, n), lambda j: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    row3 = lambda broadcast: pl.BlockSpec(
        (1 if broadcast else wblk, n, 1),
        (lambda j: (0, 0, 0)) if broadcast else (lambda j: (j, 0, 0)),
        memory_space=pltpu.VMEM)
    mask_spec = row3(mask_tok.shape[0] == 1)
    if not has_region:
        regions = jnp.zeros((1, n), jnp.float32)
    region_spec = row3(regions.shape[0] == 1)

    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(_kernel, num_heads=num_heads, head_dim=hd,
                               eps=eps, has_region=has_region,
                               score_dt=score_dt, ablate=ablate)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw_padded, n, c), cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            mask_spec,
            region_spec,
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=False,
    )(x_win, mask_tok.astype(cdt)[..., None],
      regions.astype(jnp.float32)[..., None], vec(gamma), vec(beta),
      wqkv.astype(cdt), vec(bqkv), wproj.astype(cdt), vec(bproj), bias)
    if nw_padded != nw:
        out = out[:nw]
    return out[:, :n_real, :] if n_real != n else out


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


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "stage0"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, c, nh = {"stage0": (256, 96, 3), "stage1": (128, 192, 6),
                "stage2": (64, 384, 12)}[stage]
    hp = ((h + WS - 1) // WS) * WS
    nw = (hp // WS) ** 2
    n = WS * WS
    shift = WS // 2

    rng = jax.random.PRNGKey(0)
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
    wins = jax.random.normal(ks[5], (batch * nw, n, c)).astype(DT)

    def pair(wblk, score_dt, ablate):
        def op(w):
            y = section(w, mask0, None, g_ln, b_ln, wqkv, bqkv, wproj, bproj,
                        bias_arr, nh, wblk=wblk, score_dt=score_dt,
                        ablate=ablate)
            return section(y, mask1, regions, g_ln, b_ln, wqkv, bqkv, wproj,
                           bproj, bias_arr, nh, wblk=wblk, score_dt=score_dt,
                           ablate=ablate)
        return op

    print(f"[{time.strftime('%H:%M:%S')}] compiling baseline chain...", flush=True)
    base = chain_time(lambda a: a[..., :1, :1], wins)
    print(f"[{time.strftime('%H:%M:%S')}] baseline {base:.3f} ms/link", flush=True)
    variants = [
        ("current  wblk=32 fp32-scores", 32, jnp.float32, "none"),
        ("bf16 scores       wblk=32   ", 32, DT, "none"),
        ("wblk=64  fp32                ", 64, jnp.float32, "none"),
        ("wblk=64  bf16 scores         ", 64, DT, "none"),
        ("wblk=128 bf16 scores         ", 128, DT, "none"),
        ("ablate softmax  wblk=32 bf16 ", 32, DT, "softmax"),
        ("ablate LN       wblk=32 bf16 ", 32, DT, "ln"),
        ("ablate attn-core wblk=32     ", 32, DT, "attn"),
        ("proj1 assembled wblk=32 bf16 ", 32, DT, "proj1"),
        ("io-floor  wblk=32            ", 32, DT, "io"),        # v9
        ("io-floor  wblk=16            ", 16, DT, "io"),        # v10: grid slope
        ("io-floor  wblk=8             ", 8, DT, "io"),         # v11
        ("wblk=16  fp32 (grid slope)   ", 16, jnp.float32, "none"),  # v12
        ("softmax no-max  wblk=32      ", 32, jnp.float32, "nomax"),  # v13
        ("softmax bf16exp wblk=32      ", 32, jnp.float32, "bf16sm"),  # v14
    ]
    only = sys.argv[3] if len(sys.argv) > 3 else None
    for vi, (name, wblk, sdt, ab) in enumerate(variants):
        if only is not None and str(vi) not in only.split(","):
            continue
        try:
            print(f"[{time.strftime('%H:%M:%S')}] compiling v{vi} {name.strip()}...",
                  flush=True)
            ms = chain_time(pair(wblk, sdt, ab), wins) - base
            print(f"{stage} b{batch} {name}: {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{stage} b{batch} {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
