"""Head-grouped block-diagonal window attention (round-4 swin perf push).

The round-4 roofline (BASELINE.md) puts the fused attention pair 20-24x above
its HBM bound with three dominant costs at stage 0 (per pair): softmax 6.7 ms
(exp/reduces at 64-of-128 lane occupancy), per-head score/ctx small dots
5.2 ms (64x32 @ 32x64 dots use ~1/16 of an MXU pass), and ~5 us x 685 grid
steps ~= 6.8 ms.  This probe attacks the first two with one layout change:

  Process hg heads per dot.  K/V for heads h..h+hg are lane-packed into
  block-diagonal [hg*n, hg*hd] operands (built in-kernel from contiguous
  qkv slices via lane-pad + sublane-concat; the zero blocks make the
  contraction exact per head).  Scores become ONE [n, hg*hd] @ [hg*hd, hg*n]
  dot per window -> [n, hg*n]: full-lane softmax, hg x fewer (and fatter)
  MXU passes, hg x fewer loop iterations of Mosaic op overhead.  The
  softmax denominator folds into a post-ctx [n, hg*hd] scale instead of a
  [n, hg*n] divide.  Cost: the dots do hg x the MACs (on zeros) - but the
  per-head score FLOPs are ~0.2 ms ideal, so burning even 3x there to fix
  a 12 ms VPU/overhead problem is a good trade.

Exactness: block-diagonal packing is exact; softmax max/sum are computed
per segment (static lane slices), so results match the per-head kernel to
fp32 reduction order.  `--check` compares against the pure-XLA reference.

Usage: python benchmarks/swin_attn_hg.py [stage0|stage1|stage2] [batch] [variants]
       python benchmarks/swin_attn_hg.py check   (CPU interpret exactness)
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

WS = 7


def _hg_kernel(x_ref, mask_ref, region_ref, gamma_ref, beta_ref, wqkv_ref,
               bqkv_ref, wproj_ref, bproj_ref, bias_ref, out_ref, *,
               num_heads, head_dim, hg, eps, has_region, score_f32):
    wblk, n, c = x_ref.shape
    hd = head_dim
    scale = hd ** -0.5
    cdt = x_ref.dtype

    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x - mu) * lax.rsqrt(var + eps)
    y = y * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    y = (y * mask_ref[:].astype(jnp.float32)).astype(cdt)

    qkv = lax.dot_general(
        y.reshape(wblk * n, c), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt) + bqkv_ref[0].astype(cdt)
    qkv = qkv.reshape(wblk, n, 3 * c)

    if has_region:
        r = region_ref[:].astype(jnp.float32)
        pair = r - r.reshape(r.shape[0], 1, n)
        pen = jnp.where(pair != 0.0, -100.0, 0.0)        # [R, n, n]
        pen_g = jnp.concatenate([pen] * hg, axis=-1)      # [R, n, hg*n]

    sdt = jnp.float32 if score_f32 else cdt
    acc = jnp.zeros((wblk * n, c), jnp.float32)
    for gi in range(num_heads // hg):
        g0 = gi * hg
        qg = qkv[:, :, g0 * hd:(g0 + hg) * hd].astype(sdt) * jnp.asarray(scale, sdt)
        kg = qkv[:, :, c + g0 * hd: c + (g0 + hg) * hd].astype(sdt)
        vg = qkv[:, :, 2 * c + g0 * hd: 2 * c + (g0 + hg) * hd]
        # block-diagonal K: [wblk, hg*n, hg*hd]; zero blocks => per-head exact
        kpad = jnp.concatenate(
            [jnp.pad(kg[:, :, i * hd:(i + 1) * hd],
                     ((0, 0), (0, 0), (i * hd, (hg - 1 - i) * hd)))
             for i in range(hg)], axis=1)
        attn = lax.dot_general(
            qg, kpad, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [wblk, n, hg*n]
        attn = attn + bias_ref[0, gi][None].astype(jnp.float32)
        if has_region:
            attn = attn + pen_g
        # per-segment (per-head) max, broadcast back to full lanes
        m = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.max(attn[:, :, i * n:(i + 1) * n], axis=-1, keepdims=True),
                (wblk, n, n)) for i in range(hg)], axis=-1)
        p = jnp.exp(attn - m)                             # ONE full-lane exp
        # per-segment sums, broadcast to hd lanes each (folds the divide
        # into a post-ctx scale: [n, hg*hd] instead of [n, hg*n])
        s = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.sum(p[:, :, i * n:(i + 1) * n], axis=-1, keepdims=True),
                (wblk, n, hd)) for i in range(hg)], axis=-1)
        vpad = jnp.concatenate(
            [jnp.pad(vg[:, :, i * hd:(i + 1) * hd],
                     ((0, 0), (0, 0), (i * hd, (hg - 1 - i) * hd)))
             for i in range(hg)], axis=1)                 # [wblk, hg*n, hg*hd]
        ctx = lax.dot_general(
            p.astype(cdt), vpad, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [wblk, n, hg*hd]
        ctx = (ctx / s).astype(cdt)
        acc = acc + lax.dot_general(
            ctx.reshape(wblk * n, hg * hd), wproj_ref[g0 * hd:(g0 + hg) * hd, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = acc.astype(cdt) + bproj_ref[0].astype(cdt)
    out_ref[:] = x_ref[:] + out.reshape(wblk, n, c)


def hg_section(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj, bproj,
               bias, num_heads, eps=1e-5, wblk=32, hg=1, score_f32=True,
               interpret=False):
    """bias: [1, nh, N, N].  hg must divide num_heads."""
    assert num_heads % hg == 0
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
        bias = bias + keymask[None, None, None, :]
        if has_region:
            regions = jnp.pad(regions, ((0, 0), (0, n8 - n)),
                              constant_values=-1.0)
        n_real, n = n, n8
    else:
        n_real = n
        bias = bias.astype(jnp.float32)

    # grouped bias layout: [1, nh, n, n] -> [1, nh/hg, n, hg*n]
    bias_g = (bias[0].reshape(num_heads // hg, hg, n, n)
              .transpose(0, 2, 1, 3).reshape(num_heads // hg, n, hg * n)
              [None].astype(cdt))

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

    bias_spec = pl.BlockSpec((1, num_heads // hg, n, hg * n),
                             lambda j: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    row3 = lambda broadcast: pl.BlockSpec(
        (1 if broadcast else wblk, n, 1),
        (lambda j: (0, 0, 0)) if broadcast else (lambda j: (j, 0, 0)),
        memory_space=pltpu.VMEM)
    mask_spec = row3(mask_tok.shape[0] == 1)
    if not has_region:
        regions = jnp.zeros((1, n), jnp.float32)
    region_spec = row3(regions.shape[0] == 1)

    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(_hg_kernel, num_heads=num_heads, head_dim=hd,
                               hg=hg, eps=eps, has_region=has_region,
                               score_f32=score_f32)
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
        interpret=interpret,
    )(x_win, mask_tok.astype(cdt)[..., None],
      regions.astype(jnp.float32)[..., None], vec(gamma), vec(beta),
      wqkv.astype(cdt), vec(bqkv), wproj.astype(cdt), vec(bproj), bias_g)
    if nw_padded != nw:
        out = out[:nw]
    return out[:, :n_real, :] if n_real != n else out


def _hg2_kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, bias_ref, out_ref, *, num_heads, head_dim, hg, eps,
                wblk, geom, score_f32, ablate="none", flat=False):
    """v2: mask + shift-region ids computed from the window index (iota math)
    instead of shipped as [NW, n, 1] arrays — whose trailing-1 lane padding
    made them the DOMINANT HBM traffic (128x physical inflation; measured
    io-floor 11.1 ms/pair at stage 0 vs a ~1.3 ms x-only bound)."""
    h, w, hp, wp, ws, shift, n_real = geom
    blk_i = pl.program_id(0)
    if flat:
        # 2-D [wblk*n, c] blocks (DMA shape experiment); window structure
        # recovered by a sublane-aligned reshape (n is a multiple of 8)
        rows, c = x_ref.shape
        n = rows // wblk
    else:
        _, n, c = x_ref.shape
    hd = head_dim
    scale = hd ** -0.5
    cdt = x_ref.dtype
    wn = wp // ws  # windows per row (batch folds into the leading dim)

    # per-(window, token) rolled global coords
    if ablate == "ioraw":
        # pure read+write (plus a trivial add so out isn't an alias)
        out_ref[:] = x_ref[:] + x_ref[:]
        return
    x_raw = x_ref[:].reshape(wblk, n, c) if flat else x_ref[:]

    win = (blk_i * wblk + lax.broadcasted_iota(jnp.int32, (wblk, n), 0))
    tok = lax.broadcasted_iota(jnp.int32, (wblk, n), 1)
    wr = (win // wn) % (hp // ws)
    wc = win % wn
    tr = tok // ws
    tc = tok % ws
    grh = wr * ws + tr     # rolled coords (roll by -shift happened outside)
    gwc = wc * ws + tc
    # valid-token mask: unroll the roll, then compare against the real h/w
    oh = grh + shift
    oh = jnp.where(oh >= hp, oh - hp, oh)
    ow = gwc + shift
    ow = jnp.where(ow >= wp, ow - wp, ow)
    mask = ((tok < n_real) & (oh < h) & (ow < w)).astype(jnp.float32)[..., None]

    x = x_raw.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x - mu) * lax.rsqrt(var + eps)
    y = y * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    y = (y * mask).astype(cdt)

    qkv = lax.dot_general(
        y.reshape(wblk * n, c), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt) + bqkv_ref[0].astype(cdt)
    qkv = qkv.reshape(wblk, n, 3 * c)

    if ablate == "io":
        out_ref[:] = (x_raw + y).reshape(out_ref.shape)
        return

    if shift > 0:
        # SW-MSA region ids from rolled coords (reference swin :360-374);
        # tokens attend only within equal ids
        rh = ((grh >= hp - ws).astype(jnp.int32)
              + (grh >= hp - shift).astype(jnp.int32))
        rc = ((gwc >= wp - ws).astype(jnp.int32)
              + (gwc >= wp - shift).astype(jnp.int32))
        rid = (3 * rh + rc).astype(jnp.float32)
        pair = rid[..., None] - rid.reshape(wblk, 1, n)
        pen = jnp.where(pair != 0.0, -100.0, 0.0)       # [wblk, n, n]
        pen_g = jnp.concatenate([pen] * hg, axis=-1)

    sdt = jnp.float32 if score_f32 else cdt
    acc = jnp.zeros((wblk * n, c), jnp.float32)
    for gi in range(num_heads // hg):
        g0 = gi * hg
        qg = qkv[:, :, g0 * hd:(g0 + hg) * hd].astype(sdt) * jnp.asarray(scale, sdt)
        kg = qkv[:, :, c + g0 * hd: c + (g0 + hg) * hd].astype(sdt)
        vg = qkv[:, :, 2 * c + g0 * hd: 2 * c + (g0 + hg) * hd]
        if ablate == "attn":
            ctx = qg.astype(cdt)
            acc = acc + lax.dot_general(
                ctx.reshape(wblk * n, hg * hd),
                wproj_ref[g0 * hd:(g0 + hg) * hd, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            continue
        kpad = jnp.concatenate(
            [jnp.pad(kg[:, :, i * hd:(i + 1) * hd],
                     ((0, 0), (0, 0), (i * hd, (hg - 1 - i) * hd)))
             for i in range(hg)], axis=1)
        attn = lax.dot_general(
            qg, kpad, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        attn = attn + bias_ref[0, gi][None].astype(jnp.float32)
        if shift > 0:
            attn = attn + pen_g
        if ablate == "softmax":
            p = attn * 0.001
        else:
            m = jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.max(attn[:, :, i * n:(i + 1) * n], axis=-1,
                            keepdims=True),
                    (wblk, n, n)) for i in range(hg)], axis=-1)
            p = jnp.exp(attn - m)
        s = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.sum(p[:, :, i * n:(i + 1) * n], axis=-1, keepdims=True),
                (wblk, n, hd)) for i in range(hg)], axis=-1)
        if ablate == "build":
            # skip block-diag V construction: per-head ctx dots (v1 style)
            ctx = jnp.concatenate(
                [lax.dot_general(
                    p[:, :, i * n:(i + 1) * n].astype(cdt),
                    vg[:, :, i * hd:(i + 1) * hd],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                 for i in range(hg)], axis=-1)
        else:
            vpad = jnp.concatenate(
                [jnp.pad(vg[:, :, i * hd:(i + 1) * hd],
                         ((0, 0), (0, 0), (i * hd, (hg - 1 - i) * hd)))
                 for i in range(hg)], axis=1)
            ctx = lax.dot_general(
                p.astype(cdt), vpad,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        ctx = (ctx / s).astype(cdt)
        acc = acc + lax.dot_general(
            ctx.reshape(wblk * n, hg * hd), wproj_ref[g0 * hd:(g0 + hg) * hd, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = acc.astype(cdt) + bproj_ref[0].astype(cdt)
    out_ref[:] = (x_raw + out.reshape(wblk, n, c)).reshape(out_ref.shape)


def hg2_section(x_win, geom, gamma, beta, wqkv, bqkv, wproj, bproj,
                bias, num_heads, eps=1e-5, wblk=32, hg=1, score_f32=True,
                interpret=False, ablate="none", parallel=False,
                vmem_mb=None, flat=False):
    """v2 wrapper: geom = (h, w, hp, wp, ws, shift); no mask/region arrays.
    bias: [1, nh, N, N] (N = ws*ws, unpadded)."""
    assert num_heads % hg == 0
    h, w, hp, wp, ws, shift = geom
    nw, n, c = x_win.shape
    hd = c // num_heads
    cdt = x_win.dtype
    itemsize = x_win.dtype.itemsize

    def ceil_to(v, m):
        return -(-v // m) * m

    n8 = ceil_to(n, 16 if itemsize == 2 else 8)
    n_real = n
    bias = bias.astype(jnp.float32)
    if n8 != n:
        x_win = jnp.pad(x_win, ((0, 0), (0, n8 - n), (0, 0)))
        keymask = jnp.where(jnp.arange(n8) >= n, -1e9, 0.0).astype(jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, n8 - n), (0, n8 - n)))
        bias = bias + keymask[None, None, None, :]
        n = n8

    bias_g = (bias[0].reshape(num_heads // hg, hg, n, n)
              .transpose(0, 2, 1, 3).reshape(num_heads // hg, n, hg * n)
              [None].astype(cdt))

    grid = (-(-nw // wblk),)
    nw_padded = grid[0] * wblk
    if nw_padded != nw:
        x_win = jnp.pad(x_win, ((0, nw_padded - nw), (0, 0), (0, 0)))

    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(
        _hg2_kernel, num_heads=num_heads, head_dim=hd, hg=hg, eps=eps,
        wblk=wblk, geom=(h, w, hp, wp, ws, shift, n_real),
        score_f32=score_f32, ablate=ablate, flat=flat)
    cp = {}
    if parallel or vmem_mb:
        cp["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(("parallel",) if parallel else None),
            vmem_limit_bytes=(vmem_mb * 1024 * 1024 if vmem_mb else None))
    if flat:
        x_win = x_win.reshape(nw_padded * n, c)
        x_spec = pl.BlockSpec((wblk * n, c), lambda j: (j, 0),
                              memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((nw_padded * n, c), cdt)
    else:
        x_spec = pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0),
                              memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((nw_padded, n, c), cdt)
    out = pl.pallas_call(
        kernel,
        out_shape=out_sds,
        grid=grid,
        **cp,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads // hg, n, hg * n),
                         lambda j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((wblk * n, c), lambda j: (j, 0),
                                memory_space=pltpu.VMEM) if flat else
                   pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x_win, vec(gamma), vec(beta), wqkv.astype(cdt), vec(bqkv),
      wproj.astype(cdt), vec(bproj), bias_g)
    if flat:
        out = out.reshape(nw_padded, n, c)
    if nw_padded != nw:
        out = out[:nw]
    return out[:, :n_real, :] if n_real != n else out


def make_inputs(stage, batch, dt=jnp.bfloat16, h_override=None):
    from segland_tpu.models.backbones.swin import (_rel_pos_index,
                                                   _shift_regions,
                                                   _pad_token_mask)
    h, c, nh = {"stage0": (256, 96, 3), "stage1": (128, 192, 6),
                "stage2": (64, 384, 12),
                # full-lane-tile variants of stage0/1 (c padded to 128-mult):
                # measures whether the partial-tile DMA penalty (ioraw 8.2 ms
                # vs 1.75 bound at c=96) vanishes at tile-aligned widths
                "stage0p": (256, 128, 4), "stage1p": (128, 256, 8),
                "stage3": (32, 768, 24)}[stage]
    if h_override is not None:
        h = h_override
    hp = ((h + WS - 1) // WS) * WS
    nw = (hp // WS) ** 2
    n = WS * WS
    shift = WS // 2
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    g_ln = jnp.ones((c,), jnp.float32)
    b_ln = jnp.zeros((c,), jnp.float32)
    wqkv = (jax.random.normal(ks[0], (c, 3 * c)) * 0.02).astype(dt)
    bqkv = jnp.zeros((3 * c,), dt)
    wproj = (jax.random.normal(ks[1], (c, c)) * 0.02).astype(dt)
    bproj = jnp.zeros((c,), dt)
    table = jax.random.normal(ks[2], ((2 * WS - 1) ** 2, nh)) * 0.02
    idx = _rel_pos_index(WS).reshape(-1)
    bias = jnp.asarray(table)[idx].reshape(n, n, nh).transpose(2, 0, 1)
    bias_arr = bias[None].astype(dt)
    regions = jnp.asarray(_shift_regions(hp, hp, WS, shift))
    mask0 = jnp.asarray(_pad_token_mask(h, h, hp, hp, WS, 0))
    mask1 = jnp.asarray(_pad_token_mask(h, h, hp, hp, WS, shift))
    wins = jax.random.normal(ks[5], (batch * nw, n, c)).astype(dt)
    return dict(c=c, nh=nh, g_ln=g_ln, b_ln=b_ln, wqkv=wqkv, bqkv=bqkv,
                wproj=wproj, bproj=bproj, bias=bias_arr, regions=regions,
                mask0=mask0, mask1=mask1, wins=wins, geom=(h, h, hp, hp, WS))


def check():
    """CPU interpret-mode exactness vs the pure-XLA reference."""
    jax.config.update("jax_platforms", "cpu")
    from segland_tpu.ops.pallas_attn import attn_section_reference
    for stage, hgs in [("stage0", (1, 3)), ("stage2", (2, 4, 6))]:
        I = make_inputs(stage, 1, dt=jnp.float32, h_override=26)
        x = I["wins"]
        for shifted in (False, True):
            mask = I["mask1"] if shifted else I["mask0"]
            reg = I["regions"] if shifted else None
            ref = attn_section_reference(
                x, mask, I["g_ln"], I["b_ln"], I["wqkv"], I["bqkv"],
                I["wproj"], I["bproj"], I["bias"], I["nh"], regions=reg)
            for hg in hgs:
                got = hg_section(x, mask, reg, I["g_ln"], I["b_ln"], I["wqkv"],
                                 I["bqkv"], I["wproj"], I["bproj"], I["bias"],
                                 I["nh"], wblk=4, hg=hg, interpret=True)
                d = float(jnp.max(jnp.abs(got - ref)))
                print(f"{stage} shifted={shifted} hg={hg}: max|d|={d:.2e}")
                assert d < 2e-5, (stage, shifted, hg, d)
                got2 = hg2_section(
                    x, I["geom"] + ((WS // 2) if shifted else 0,),
                    I["g_ln"], I["b_ln"], I["wqkv"], I["bqkv"], I["wproj"],
                    I["bproj"], I["bias"], I["nh"], wblk=4, hg=hg,
                    interpret=True)
                d2 = float(jnp.max(jnp.abs(got2 - ref)))
                print(f"{stage} shifted={shifted} hg={hg} v2: max|d|={d2:.2e}")
                assert d2 < 2e-5, (stage, shifted, hg, d2)
    print("CHECK OK")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
        return
    from swin_attn_variants import chain_time
    stage = sys.argv[1] if len(sys.argv) > 1 else "stage0"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    I = make_inputs(stage, batch)
    nh = I["nh"]

    def pair(wblk, hg, f32):
        def op(w):
            y = hg_section(w, I["mask0"], None, I["g_ln"], I["b_ln"],
                           I["wqkv"], I["bqkv"], I["wproj"], I["bproj"],
                           I["bias"], nh, wblk=wblk, hg=hg, score_f32=f32)
            return hg_section(y, I["mask1"], I["regions"], I["g_ln"],
                              I["b_ln"], I["wqkv"], I["bqkv"], I["wproj"],
                              I["bproj"], I["bias"], nh, wblk=wblk, hg=hg,
                              score_f32=f32)
        return op

    def pair2(wblk, hg, f32, ablate="none", parallel=False, vmem_mb=None,
              flat=False):
        kw = dict(wblk=wblk, hg=hg, score_f32=f32, ablate=ablate,
                  parallel=parallel, vmem_mb=vmem_mb, flat=flat)
        def op(w):
            y = hg2_section(w, I["geom"] + (0,), I["g_ln"], I["b_ln"],
                            I["wqkv"], I["bqkv"], I["wproj"], I["bproj"],
                            I["bias"], nh, **kw)
            return hg2_section(y, I["geom"] + (WS // 2,), I["g_ln"],
                               I["b_ln"], I["wqkv"], I["bqkv"], I["wproj"],
                               I["bproj"], I["bias"], nh, **kw)
        return op

    if len(sys.argv) > 4 and sys.argv[4] == "prepad":
        # timing-only: ship windows already token-padded to 64 so the
        # in-op jnp.pad/slice (a sublane-misaligned relayout at n=49)
        # drops out of the measurement.  Numerics differ (pad rows are
        # treated as real tokens) — io characterization only.
        import jax.numpy as _j
        I["wins"] = _j.pad(I["wins"], ((0, 0), (0, 15), (0, 0)))
        I["bias"] = _j.pad(I["bias"], ((0, 0), (0, 0), (0, 15), (0, 15)))
    print(f"[{time.strftime('%H:%M:%S')}] baseline...", flush=True)
    base = chain_time(lambda a: a[..., :1, :1], I["wins"])
    print(f"baseline {base:.3f} ms/link", flush=True)
    # spec tokens: "<ver>-<hg>-<wblk>[-bf16]", e.g. "2-3-64" = v2 kernel,
    # hg=3, wblk=64, fp32 scores; "1-1-32-bf16" = v1, bf16 scores
    specs = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["1-1-32", f"1-{nh}-32", f"2-{nh}-32", f"2-{nh}-64"])
    for spec in specs:
        parts = spec.split("-")
        ver, hg, wblk = int(parts[0]), int(parts[1]), int(parts[2])
        f32 = "bf16" not in parts
        ablate = "none"
        parallel = "par" in parts
        flat = "flat" in parts
        vmem_mb = None
        for p in parts[3:]:
            if p.startswith("ab"):
                ablate = p[2:]
            elif p.startswith("vm"):
                vmem_mb = int(p[2:])
        name = (f"v{ver} hg={hg} wblk={wblk} {'f32' if f32 else 'bf16'}"
                + (f" ablate={ablate}" if ablate != "none" else "")
                + (" par" if parallel else "")
                + (" flat" if flat else "")
                + (f" vm{vmem_mb}" if vmem_mb else ""))
        try:
            print(f"[{time.strftime('%H:%M:%S')}] compiling {name}...",
                  flush=True)
            mk = (pair(wblk, hg, f32) if ver == 1
                  else pair2(wblk, hg, f32, ablate, parallel, vmem_mb, flat))
            ms = chain_time(mk, I["wins"]) - base
            print(f"{stage} b{batch} {name}: {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{stage} b{batch} {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
