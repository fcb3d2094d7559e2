"""Pallas fused window attention for Swin on TPU.

The XLA path materializes [num_windows, heads, 49, 49] attention tensors in
HBM several times per block (logits, +bias, softmax) — and 49 is far off the
128-lane tile, so the physical footprint is ~2.6x the logical one.  This
kernel keeps the whole attention core (q@k^T, +rel-pos-bias(+shift-mask),
fp32 softmax, @v) in VMEM: HBM traffic drops to qkv in / out once.

Measured (v5e via axon tunnel, stage2-like shape 800 windows x 12 heads,
bf16): numerically identical to the XLA path, ~2% faster steady-state, but
~244s Mosaic AOT compile per distinct shape over the tunnel (vs 3s XLA).
Kept OPT-IN (SwinTransformer(use_pallas=True)); on a local TPU runtime the
compile cost amortizes and the VMEM-resident form should win more — revisit
when profiling is available.

Layout contract (prepared by models/backbones/swin.py):
  qkv:  [NW, N, 3C]   window-partitioned (NW = B * nW_img), N = ws*ws
  bias: [nW_img, nh, N, N] rel-pos bias (+ shift mask for shifted blocks);
        window w uses bias[w % nW_img].  Pass nW_img == 1 for non-shifted
        blocks (bias identical across windows).
Output: [NW, N, C] attention output (pre-projection).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(qkv_ref, bias_ref, out_ref, *, num_heads: int, head_dim: int):
    wblk, n, c3 = qkv_ref.shape
    c = c3 // 3
    hd = head_dim
    scale = hd ** -0.5
    bias_rows = bias_ref.shape[0]
    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd : (h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, c + h * hd : c + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * c + h * hd : 2 * c + (h + 1) * hd]
        attn = lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [wblk, n, n]
        if bias_rows == 1:
            attn = attn + bias_ref[0, h][None].astype(jnp.float32)
        else:
            attn = attn + bias_ref[:, h].astype(jnp.float32)
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = lax.dot_general(
            attn.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [wblk, n, hd]
        out_ref[:, :, h * hd : (h + 1) * hd] = out.astype(out_ref.dtype)


def window_attention_fused(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                           wblk: int | None = None, interpret: bool = False) -> jnp.ndarray:
    """qkv [NW, N, 3C], bias [nW_img or 1, nh, N, N] -> out [NW, N, C]."""
    nw, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    nw_img = bias.shape[0]
    assert nw % max(nw_img, 1) == 0, (nw, nw_img)

    if wblk is None:
        # Physical VMEM per window (TPU pads the trailing dims to the
        # (sublane, 128-lane) tile): qkv + out blocks are double-buffered,
        # bias likewise; plus fp32 attention scratch. Stay under ~10 MB of
        # the 16 MB scoped limit.
        def ceil_to(v, m):
            return -(-v // m) * m

        n_pad = ceil_to(n, 8)
        lanes = ceil_to(n, 128)
        itemsize = qkv.dtype.itemsize
        per_win = (
            2 * n_pad * ceil_to(3 * c, 128) * itemsize  # qkv (double-buffered)
            + 2 * n_pad * ceil_to(c, 128) * itemsize    # out
            + 2 * num_heads * n_pad * lanes * bias.dtype.itemsize  # bias
            + 3 * n_pad * lanes * 4                      # fp32 attn scratch
        )
        budget = max(1, (10 * 1024 * 1024) // per_win)
        limit = nw_img if nw_img > 1 else nw
        wblk = 1
        for cand in range(min(budget, limit), 0, -1):
            if limit % cand == 0:
                wblk = cand
                break
    grid = (nw // wblk,)

    if nw_img == 1:
        bias_spec = pl.BlockSpec((1, num_heads, n, n), lambda j: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        assert nw_img % wblk == 0
        chunks_per_img = nw_img // wblk
        bias_spec = pl.BlockSpec((wblk, num_heads, n, n),
                                 lambda j: (j % chunks_per_img, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    kernel = functools.partial(_attn_kernel, num_heads=num_heads, head_dim=hd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw, n, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c3), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, bias)


def _attn_section_kernel(x_ref, mask_ref, region_ref, gamma_ref, beta_ref,
                         wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                         out_ref, *, num_heads: int, head_dim: int,
                         eps: float, has_region: bool):
    """Whole attention section of a Swin block in one VMEM pass:
    LN -> (pad-token zeroing) -> qkv -> per-head window attention
    (+rel-pos bias, + shift mask recomputed in-kernel from per-token region
    ids, fp32 softmax) -> proj -> +residual.

    The projection is accumulated per head (ctx_h @ wproj[h*hd:(h+1)*hd])
    so the full context tensor never needs assembling.  Recomputing the
    shifted-window mask from region ids (tokens attend only within their
    cyclic-shift region, reference swintransformer.py:360-379) keeps the
    bias input window-independent, which frees the window-block size from
    any per-image divisibility constraint."""
    wblk, n, c = x_ref.shape
    hd = head_dim
    scale = hd ** -0.5
    cdt = x_ref.dtype

    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x - mu) * lax.rsqrt(var + eps)
    y = y * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    # reproduce the reference's pad-AFTER-norm: pad tokens are zeros
    # (swintransformer.py:333-340 pads the normalized tensor).
    # mask block is [wblk, n, 1] (3-D so the TPU last-two-dims tiling
    # rule sees (n, 1) == the array dims) and broadcasts over y.
    y = y * mask_ref[:].astype(jnp.float32)
    y = y.astype(cdt)

    # The (wblk, n, c) <-> (wblk*n, c) shape casts below require n to be
    # sublane-aligned; the wrapper pads windows to n8 tokens (phantom keys
    # are masked with -1e9 in the bias, phantom rows sliced off outside).
    qkv = lax.dot_general(
        y.reshape(wblk * n, c), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,  # Mosaic requires 32-bit acc
    ).astype(cdt) + bqkv_ref[0].astype(cdt)
    qkv = qkv.reshape(wblk, n, 3 * c)

    if has_region:
        r = region_ref[:].astype(jnp.float32)   # [1 or wblk, n, 1]
        pair = r - r.reshape(r.shape[0], 1, n)  # [1 or wblk, n, n]
        shift_pen = jnp.where(pair != 0.0, -100.0, 0.0)

    acc = jnp.zeros((wblk * n, c), jnp.float32)
    for h in range(num_heads):
        q = qkv[:, :, h * hd : (h + 1) * hd].astype(jnp.float32) * scale
        k = qkv[:, :, c + h * hd : c + (h + 1) * hd].astype(jnp.float32)
        v = qkv[:, :, 2 * c + h * hd : 2 * c + (h + 1) * hd]
        attn = lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [wblk, n, n]
        attn = attn + bias_ref[0, h][None].astype(jnp.float32)
        if has_region:
            attn = attn + shift_pen
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        ctx = lax.dot_general(
            attn.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # [wblk, n, hd]
        acc = acc + lax.dot_general(
            ctx.reshape(wblk * n, hd), wproj_ref[h * hd : (h + 1) * hd, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = acc.astype(cdt) + bproj_ref[0].astype(cdt)
    out_ref[:] = x_ref[:] + out.reshape(wblk, n, c)


def _attn_section_pallas(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv,
                         wproj, bproj, bias, num_heads, eps, interpret,
                         group=1):
    nw, n, c = x_win.shape
    hd = c // num_heads
    cdt = x_win.dtype
    itemsize = x_win.dtype.itemsize
    has_region = regions is not None

    def ceil_to(v, m):
        return -(-v // m) * m

    # pad windows to a sublane-aligned token count so the kernel's
    # (wblk, n, c) <-> (wblk*n, c) shape casts are legal in Mosaic;
    # phantom tokens: zero features (mask 0), keys masked to -1e9
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
    assert bias.shape[0] == 1, "bias must be window-independent (rel-pos only)"

    # tile the (tiny) per-window arrays over the batch so their blocks
    # follow x's index map directly and never constrain wblk
    if mask_tok.shape[0] > 1:
        mask_tok = jnp.tile(mask_tok, (nw // mask_tok.shape[0], 1))
    if has_region and regions.shape[0] > 1:
        regions = jnp.tile(regions, (nw // regions.shape[0], 1))

    # Super-window grouping: fuse `group` windows into one kernel window of
    # group*n tokens with a block-diagonal bias (cross-window keys at -1e9
    # underflow to an exact 0 after softmax, so results are bit-identical
    # modulo fp32 reduction order).  Swin's N=49 / head_dim=32 windows are
    # far below the 128-lane MXU tile; each per-head batched dot lowers to
    # wblk tiny passes.  Grouping multiplies only the (small) score/ctx
    # FLOPs by `group` while turning them into full-tile matmuls.
    n_orig, nw_orig = n, nw
    gg = int(group) if int(group) > 1 else 1
    if gg > 1:
        if nw % gg:
            pad = gg - nw % gg
            x_win = jnp.pad(x_win, ((0, pad), (0, 0), (0, 0)))
            if mask_tok.shape[0] > 1:
                mask_tok = jnp.pad(mask_tok, ((0, pad), (0, 0)))
            if has_region and regions.shape[0] > 1:
                regions = jnp.pad(regions, ((0, pad), (0, 0)),
                                  constant_values=-1.0)
            nw = nw + pad
        x_win = x_win.reshape(nw // gg, gg * n, c)
        mask_tok = (jnp.tile(mask_tok, (1, gg)) if mask_tok.shape[0] == 1
                    else mask_tok.reshape(nw // gg, gg * n))
        if has_region and regions.shape[0] > 1:
            regions = regions.reshape(nw // gg, gg * n)
        elif has_region:
            regions = jnp.tile(regions, (1, gg))
        blk = np.kron(np.eye(gg, dtype=np.float32),
                      np.ones((n, n), np.float32))
        bias = jnp.where(jnp.asarray(blk) > 0.0,
                         jnp.tile(bias.astype(jnp.float32), (1, 1, gg, gg)),
                         -1e9).astype(bias.dtype)
        nw, n = nw // gg, gg * n

    n_pad = ceil_to(n, 8)
    lanes = ceil_to(n, 128)
    # per-window VMEM: x/out double-buffered + qkv + fp32 intermediates
    # (x, y from the LN; qkv before the cast; acc; attn scratch + shift pen)
    per_win = (
        4 * n_pad * ceil_to(c, 128) * itemsize        # x + out, double-buffered
        + n_pad * ceil_to(3 * c, 128) * (itemsize + 4)  # qkv value bf16 + fp32
        + 3 * n_pad * ceil_to(c, 128) * 4             # fp32 x, y, acc
        + (3 + (1 if has_region else 0)) * n_pad * lanes * 4  # fp32 attn scratch
        + 4 * n_pad * 128 * itemsize                  # pad mask + regions
    )
    shared = ((4 * c * c + 4 * c) * itemsize
              + num_heads * n_pad * lanes * bias.dtype.itemsize)
    budget = max(1, (11 * 1024 * 1024 - shared) // per_win)
    wblk = min(budget, max(1, 32 // gg), nw)
    grid = (-(-nw // wblk),)
    nw_padded = grid[0] * wblk
    if nw_padded != nw:
        # pad to a whole number of window blocks (garbage rows are dropped
        # by the final slice; mask rows 0 keep their LN output finite)
        x_win = jnp.pad(x_win, ((0, nw_padded - nw), (0, 0), (0, 0)))
        if mask_tok.shape[0] > 1:
            mask_tok = jnp.pad(mask_tok, ((0, nw_padded - nw), (0, 0)))
        if has_region and regions.shape[0] > 1:
            regions = jnp.pad(regions, ((0, nw_padded - nw), (0, 0)))

    bias_spec = pl.BlockSpec((1, num_heads, n, n), lambda j: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    # NB: broadcast (single-row array) and per-window are distinct cases even
    # when wblk == 1 — the index map must still advance with j for
    # per-window arrays, or every grid step would read window 0's rows.
    row3 = lambda broadcast: pl.BlockSpec(
        (1 if broadcast else wblk, n, 1),
        (lambda j: (0, 0, 0)) if broadcast else (lambda j: (j, 0, 0)),
        memory_space=pltpu.VMEM)
    mask_spec = row3(mask_tok.shape[0] == 1)
    if not has_region:
        regions = jnp.zeros((1, n), jnp.float32)
    region_spec = row3(regions.shape[0] == 1)

    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(_attn_section_kernel, num_heads=num_heads,
                               head_dim=hd, eps=eps, has_region=has_region)
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
        cost_estimate=pl.CostEstimate(
            flops=2 * nw * n * c * (4 * c + 2 * n),
            bytes_accessed=2 * nw * n * c * itemsize,
            transcendentals=nw * num_heads * n * n,
        ),
        interpret=interpret,
    )(x_win, mask_tok.astype(cdt)[..., None], regions.astype(jnp.float32)[..., None],
      vec(gamma), vec(beta), wqkv.astype(cdt), vec(bqkv), wproj.astype(cdt),
      vec(bproj), bias)
    if nw_padded != nw:
        out = out[:nw]
    if gg > 1:
        out = out.reshape(nw * gg, n_orig, c)[:nw_orig]
    return out[:, :n_real, :] if n_real != n_orig else out


def _v2_attn_body(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, bias_ref, *,
                  num_heads, head_dim, hg, eps, wblk, geom,
                  score_f32=True):
    """Round-4 attention-section kernel body (benchmarks/swin_attn_hg.py).
    Returns the post-residual [wblk, n, c] activation; shared by the
    attention-only v2 kernel and the round-5 whole-block (attn+MLP) kernel.

    Two changes vs _attn_section_kernel, both from the round-4 roofline:

    1. Index-math masks.  The v1 kernel shipped the pad-token mask and
       SW-MSA region ids as [NW, N, 1] arrays; TPU tiling pads the trailing
       1 to 128 lanes, so they were the DOMINANT HBM traffic of the whole
       section (measured io-floor 11.1 ms/pair at stage 0 vs a ~1.3 ms
       x-only bound).  Both are pure functions of the window index
       (reference swintransformer.py:333-340 pad, :360-374 regions), so
       they are recomputed here from program_id + iota: zero HBM bytes.

    2. Head-grouping (hg).  K/V for hg consecutive heads are lane-packed
       into block-diagonal [hg*N, hg*hd] operands, turning the per-head
       N=49/hd=32 score/ctx dots — far below the 128-lane MXU tile — into
       hg-x fewer, full-lane dots, and the softmax into a single full-lane
       exp.  The zero blocks make each head's contraction exact; the
       softmax max/sum stay per-head via static lane slices.  The
       denominator folds into a post-ctx [N, hg*hd] scale.
    """
    h, w, hp, wp, ws, shift, n_real = geom
    blk_i = pl.program_id(0)
    _, n, c = x_ref.shape
    hd = head_dim
    scale = hd ** -0.5
    cdt = x_ref.dtype
    wn = wp // ws  # windows per image row (batch folds into leading dim)

    win = (blk_i * wblk + lax.broadcasted_iota(jnp.int32, (wblk, n), 0))
    tok = lax.broadcasted_iota(jnp.int32, (wblk, n), 1)
    wr = (win // wn) % (hp // ws)
    wc = win % wn
    grh = wr * ws + tok // ws   # rolled coords (roll by -shift done outside)
    gwc = wc * ws + tok % ws
    oh = grh + shift            # un-roll for the valid-token test
    oh = jnp.where(oh >= hp, oh - hp, oh)
    ow = gwc + shift
    ow = jnp.where(ow >= wp, ow - wp, ow)
    mask = ((tok < n_real) & (oh < h) & (ow < w)).astype(jnp.float32)[..., None]

    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x - mu) * lax.rsqrt(var + eps)
    y = y * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    y = (y * mask).astype(cdt)  # pad-AFTER-norm (swintransformer.py:333-340)

    qkv = lax.dot_general(
        y.reshape(wblk * n, c), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt) + bqkv_ref[0].astype(cdt)
    qkv = qkv.reshape(wblk, n, 3 * c)

    if shift > 0:
        rh = ((grh >= hp - ws).astype(jnp.int32)
              + (grh >= hp - shift).astype(jnp.int32))
        rc = ((gwc >= wp - ws).astype(jnp.int32)
              + (gwc >= wp - shift).astype(jnp.int32))
        rid = (3 * rh + rc).astype(jnp.float32)
        pair = rid[..., None] - rid.reshape(wblk, 1, n)
        pen = jnp.where(pair != 0.0, -100.0, 0.0)
        pen_g = jnp.concatenate([pen] * hg, axis=-1)   # [wblk, n, hg*n]

    sdt = jnp.float32 if score_f32 else cdt
    acc = jnp.zeros((wblk * n, c), jnp.float32)
    for gi in range(num_heads // hg):
        g0 = gi * hg
        qg = qkv[:, :, g0 * hd:(g0 + hg) * hd].astype(sdt) * jnp.asarray(scale, sdt)
        kg = qkv[:, :, c + g0 * hd: c + (g0 + hg) * hd].astype(sdt)
        vg = qkv[:, :, 2 * c + g0 * hd: 2 * c + (g0 + hg) * hd]
        kpad = jnp.concatenate(
            [jnp.pad(kg[:, :, i * hd:(i + 1) * hd],
                     ((0, 0), (0, 0), (i * hd, (hg - 1 - i) * hd)))
             for i in range(hg)], axis=1)              # [wblk, hg*n, hg*hd]
        attn = lax.dot_general(
            qg, kpad, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [wblk, n, hg*n]
        attn = attn + bias_ref[0, gi][None].astype(jnp.float32)
        if shift > 0:
            attn = attn + pen_g
        m = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.max(attn[:, :, i * n:(i + 1) * n], axis=-1, keepdims=True),
                (wblk, n, n)) for i in range(hg)], axis=-1)
        p = jnp.exp(attn - m)
        s = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.sum(p[:, :, i * n:(i + 1) * n], axis=-1, keepdims=True),
                (wblk, n, hd)) for i in range(hg)], axis=-1)
        vpad = jnp.concatenate(
            [jnp.pad(vg[:, :, i * hd:(i + 1) * hd],
                     ((0, 0), (0, 0), (i * hd, (hg - 1 - i) * hd)))
             for i in range(hg)], axis=1)
        ctx = lax.dot_general(
            p.astype(cdt), vpad, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [wblk, n, hg*hd]
        ctx = (ctx / s).astype(cdt)
        acc = acc + lax.dot_general(
            ctx.reshape(wblk * n, hg * hd), wproj_ref[g0 * hd:(g0 + hg) * hd, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = acc.astype(cdt) + bproj_ref[0].astype(cdt)
    return x_ref[:] + out.reshape(wblk, n, c)


def _attn_section_v2_kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref,
                            wproj_ref, bproj_ref, bias_ref, out_ref, *,
                            num_heads, head_dim, hg, eps, wblk, geom,
                            score_f32=True):
    out_ref[:] = _v2_attn_body(
        x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        bias_ref, num_heads=num_heads, head_dim=head_dim, hg=hg, eps=eps,
        wblk=wblk, geom=geom, score_f32=score_f32)


def _block_v3_kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref,
                     wproj_ref, bproj_ref, bias_ref, gamma2_ref, beta2_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                     num_heads, head_dim, hg, eps, wblk, geom):
    """Round-5 whole-block kernel: attention section + LN2+MLP+residual in
    ONE VMEM pass.  The round-4 io decomposition showed the Pallas block-DMA
    path sustains only ~120-175 GB/s on these window shapes (vs XLA's ~819),
    so the dominant recoverable cost of the two-kernel block was the MLP
    kernel re-reading and re-writing the same [NW, N, C] activations the
    attention kernel had just written — fusing halves the slow-path round
    trips (reference block = attn + MLP, swintransformer.py:171-190).

    The MLP also runs over the n8-padded phantom tokens and any pad tokens
    (token-local garbage rows, sliced/unpadded away by the caller) — ~30%
    extra MXU flops at N=49->64, repaying a full HBM round trip."""
    a = _v2_attn_body(
        x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        bias_ref, num_heads=num_heads, head_dim=head_dim, hg=hg, eps=eps,
        wblk=wblk, geom=geom)
    from .pallas_mlp import _gelu_exact_poly, _gelu_tanh

    _, n, c = a.shape
    cdt = a.dtype
    a2 = a.reshape(wblk * n, c)
    af = a2.astype(jnp.float32)
    mu = jnp.mean(af, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(af * af, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (af - mu) * lax.rsqrt(var + eps)
    y = (y * gamma2_ref[0].astype(jnp.float32)
         + beta2_ref[0].astype(jnp.float32)).astype(cdt)
    hmid = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    hmid = hmid.astype(cdt) + b1_ref[0].astype(cdt)
    gelu = _gelu_tanh if cdt == jnp.bfloat16 else _gelu_exact_poly
    hmid = gelu(hmid.astype(jnp.float32)).astype(cdt)
    o = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
    o = o.astype(cdt) + b2_ref[0].astype(cdt)
    out_ref[:] = (a2 + o).reshape(wblk, n, c)


# num_heads -> head-group size; measured on-chip (BASELINE.md round-4
# "v2 kernel" table: stage0 hg3 19.5 ms/pair vs 23.7 v1; stage1 hg6 8.0 vs
# 11.8; stage2 hg4 4.56 vs 6.03/5.62).  Fallback: largest divisor <= 4.
_V2_HG = {3: 3, 6: 6, 12: 4, 24: 4}


def _v2_hg_default(num_heads):
    if num_heads in _V2_HG:
        return _V2_HG[num_heads]
    for cand in (4, 3, 2, 1):
        if num_heads % cand == 0:
            return cand
    return 1


def _attn_section_v2_pallas(x_win, geom, gamma, beta, wqkv, bqkv, wproj,
                            bproj, bias, num_heads, eps, interpret,
                            hg=None, wblk=None):
    """geom = (h, w, hp, wp, ws, shift); bias [1, nh, N, N] rel-pos only."""
    h, w, hp, wp, ws, shift = geom
    nw, n, c = x_win.shape
    hd = c // num_heads
    cdt = x_win.dtype
    itemsize = x_win.dtype.itemsize
    if hg is None:
        hg = _v2_hg_default(num_heads)
    assert num_heads % hg == 0

    def ceil_to(v, m):
        return -(-v // m) * m

    n8 = ceil_to(n, 16 if itemsize == 2 else 8)
    n_real = n
    # per-window biases (allowed by the older window_attention_fused
    # contract) would be silently truncated by the bias[0] below
    assert bias.shape[0] == 1, f"v2 kernel needs a shared bias, got {bias.shape}"
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

    if wblk is None:
        # Calibrated on-chip (BASELINE.md round 4): static VMEM estimates
        # over-predict Mosaic's real (liveness-reused) allocation by 3-6x,
        # so size by the measured fit boundary per channel width instead:
        # c<=192 fits wblk=32 (64 fails), c<=384 fits 16 (32 fails),
        # larger stages take 8.
        wblk = 32 if c <= 192 else (16 if c <= 384 else 8)
        wblk = max(1, min(wblk, nw))

    grid = (-(-nw // wblk),)
    nw_padded = grid[0] * wblk
    if nw_padded != nw:
        x_win = jnp.pad(x_win, ((0, nw_padded - nw), (0, 0), (0, 0)))

    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(
        _attn_section_v2_kernel, num_heads=num_heads, head_dim=hd, hg=hg,
        eps=eps, wblk=wblk, geom=(h, w, hp, wp, ws, shift, n_real))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw_padded, n, c), cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads // hg, n, hg * n),
                         lambda j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * nw * n * c * (4 * c + 2 * hg * n),
            bytes_accessed=2 * nw * n * c * itemsize,
            transcendentals=nw * num_heads * n * n,
        ),
        interpret=interpret,
    )(x_win, vec(gamma), vec(beta), wqkv.astype(cdt), vec(bqkv),
      wproj.astype(cdt), vec(bproj), bias_g)
    if nw_padded != nw:
        out = out[:nw]
    return out[:, :n_real, :] if n_real != n else out


def attn_section_reference(x_win, mask_tok, gamma, beta, wqkv, bqkv, wproj,
                           bproj, bias, num_heads, eps=1e-5, regions=None):
    """Pure-XLA reference for the fused attention section (tests/backward).

    bias: [1, nh, N, N] rel-pos bias; regions: optional [nW_img, N] shift
    region ids (tokens attend only within equal-id regions)."""
    cdt = x_win.dtype
    xf = x_win.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    nw = x_win.shape[0]
    m = mask_tok.astype(jnp.float32)
    if mask_tok.shape[0] == 1:
        y = y * m[0][None, :, None]
    else:
        y = (y.reshape(nw // mask_tok.shape[0], mask_tok.shape[0], *y.shape[1:])
             * m[None, :, :, None]).reshape(y.shape)
    y = y.astype(cdt)
    qkv = (jnp.dot(y, wqkv.astype(cdt), preferred_element_type=jnp.float32)
           .astype(cdt) + bqkv.astype(cdt))
    if regions is not None:
        pen = jnp.where(regions[:, :, None] != regions[:, None, :], -100.0, 0.0)
        full_bias = bias.astype(jnp.float32) + pen[:, None]  # [nW, nh, N, N]
    else:
        full_bias = bias.astype(jnp.float32)
    ctx = window_attention_reference(qkv, full_bias.astype(bias.dtype), num_heads)
    out = (jnp.dot(ctx, wproj.astype(cdt), preferred_element_type=jnp.float32)
           .astype(cdt) + bproj.astype(cdt))
    return x_win + out


def _attn_section_dispatch(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv,
                           wproj, bproj, bias, num_heads, eps, interpret,
                           group, geom, hg):
    if geom is not None:
        # v2 kernel: masks/regions from index math — the mask_tok/regions
        # array args go unread here and are DCE'd by XLA (they still feed
        # the XLA fallback and the backward pass)
        return _attn_section_v2_pallas(x_win, geom, gamma, beta, wqkv, bqkv,
                                       wproj, bproj, bias, num_heads, eps,
                                       interpret, hg=hg)
    return _attn_section_pallas(x_win, mask_tok, regions, gamma, beta, wqkv,
                                bqkv, wproj, bproj, bias, num_heads, eps,
                                interpret, group=group)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def _attn_section(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj,
                  bproj, bias, num_heads, eps, interpret, group, geom, hg):
    return _attn_section_dispatch(x_win, mask_tok, regions, gamma, beta, wqkv,
                                  bqkv, wproj, bproj, bias, num_heads, eps,
                                  interpret, group, geom, hg)


def _attn_section_fwd(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv,
                      wproj, bproj, bias, num_heads, eps, interpret, group,
                      geom, hg):
    out = _attn_section_dispatch(x_win, mask_tok, regions, gamma, beta, wqkv,
                                 bqkv, wproj, bproj, bias, num_heads, eps,
                                 interpret, group, geom, hg)
    return out, (x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj,
                 bproj, bias)


def _attn_section_bwd(num_heads, eps, interpret, group, geom, hg, saved, g):
    x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj, bproj, bias = saved

    def f(x_win_, gamma_, beta_, wqkv_, bqkv_, wproj_, bproj_, bias_):
        return attn_section_reference(x_win_, mask_tok, gamma_, beta_, wqkv_,
                                      bqkv_, wproj_, bproj_, bias_, num_heads,
                                      eps, regions=regions)

    # bias is differentiated too: the relative_position_bias_table is a
    # trained parameter (reference swintransformer.py:94,115) — a zero
    # cotangent here would silently freeze it under --fused training.
    _, vjp = jax.vjp(f, x_win, gamma, beta, wqkv, bqkv, wproj, bproj, bias)
    dx, dg, db, dwq, dbq, dwp, dbp, dbias = vjp(g)
    return (dx, jnp.zeros_like(mask_tok),
            None if regions is None else jnp.zeros_like(regions),
            dg, db, dwq, dbq, dwp, dbp, dbias)


_attn_section.defvjp(_attn_section_fwd, _attn_section_bwd)


def swin_attn_section_fused(x_win, mask_tok, gamma, beta, wqkv, bqkv, wproj,
                            bproj, bias, num_heads, eps=1e-5, regions=None,
                            interpret=False, group=1, geom=None, hg=None):
    """Fused LN+qkv+window-attention+proj+residual over partitioned windows.

    x_win: [NW, N, C] raw (un-normalized) window-partitioned input;
    mask_tok: [nW_img or 1, N] static 1/0 valid-token mask (zeroing after LN
    reproduces the reference's pad-after-norm semantics); bias:
    [1, nh, N, N] relative-position bias; regions: optional [nW_img, N]
    shift-region ids for SW-MSA blocks (the pairwise mask is recomputed
    in-kernel).  Falls back to the XLA reference on non-TPU backends.

    geom: optional (h, w, hp, wp, ws, shift).  When given, the forward runs
    the round-4 v2 kernel (_attn_section_v2_kernel): pad-mask + region ids
    from index math instead of the [NW, N, 1] arrays (whose trailing-1 lane
    padding made them the section's dominant HBM traffic), plus hg-head-
    grouped block-diagonal dots.  mask_tok/regions must still be passed
    (consistent with geom) — they feed the XLA fallback and backward.
    hg: head-group size (None = measured default for num_heads).
    """
    if geom is not None and group != 1:
        # the v2 (geom) kernel uses head-grouping (hg) instead of
        # super-window grouping; silently ignoring group would make the
        # attn_group knob a no-op (round-4 advisor finding)
        raise ValueError("group != 1 is a v1-kernel knob; with geom set "
                         "(v2 kernel) use hg= head-grouping instead")
    if not interpret:
        from .pallas_mlp import force_interpret

        interpret = force_interpret()  # SEGLAND_PALLAS_INTERPRET=1 escape
    if not (interpret or jax.default_backend() == "tpu"):
        return attn_section_reference(x_win, mask_tok, gamma, beta, wqkv,
                                      bqkv, wproj, bproj, bias, num_heads,
                                      eps, regions=regions)
    return _attn_section(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv,
                         wproj, bproj, bias, num_heads, eps, interpret, group,
                         geom, hg)


def window_attention_reference(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Pure-XLA reference with identical contract (for tests/fallback)."""
    nw, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    q = qkv[:, :, :c].reshape(nw, n, num_heads, hd).transpose(0, 2, 1, 3)
    k = qkv[:, :, c : 2 * c].reshape(nw, n, num_heads, hd).transpose(0, 2, 1, 3)
    v = qkv[:, :, 2 * c :].reshape(nw, n, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("whnd,whmd->whnm", q * (hd ** -0.5), k).astype(jnp.float32)
    nw_img = bias.shape[0]
    if nw_img == 1:
        attn = attn + bias.astype(jnp.float32)
    else:
        b = nw // nw_img
        attn = attn.reshape(b, nw_img, num_heads, n, n) + bias[None].astype(jnp.float32)
        attn = attn.reshape(nw, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("whnm,whmd->whnd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(nw, n, c)

# ---------------------------------------------------------------------------
# Round-5 whole-block fusion: attention section + MLP in one kernel
# ---------------------------------------------------------------------------


def block_reference(x_win, mask_tok, gamma, beta, wqkv, bqkv, wproj, bproj,
                    bias, gamma2, beta2, w1, b1, w2, b2, num_heads,
                    eps=1e-5, regions=None):
    """Pure-XLA reference for the fused block (tests/fallback/backward):
    attention section then LN2+MLP+residual (reference block structure,
    swintransformer.py:171-190)."""
    from .pallas_mlp import ln_mlp_reference

    a = attn_section_reference(x_win, mask_tok, gamma, beta, wqkv, bqkv,
                               wproj, bproj, bias, num_heads, eps,
                               regions=regions)
    nw, n, c = a.shape
    out = ln_mlp_reference(a.reshape(nw * n, c), gamma2, beta2, w1, b1, w2,
                           b2, eps=eps)
    return out.reshape(nw, n, c)


def _swin_block_v3_pallas(x_win, geom, gamma, beta, wqkv, bqkv, wproj, bproj,
                          bias, gamma2, beta2, w1, b1, w2, b2, num_heads,
                          eps, interpret, hg=None, wblk=None):
    """geom = (h, w, hp, wp, ws, shift); bias [1, nh, N, N] rel-pos only.
    Same prologue as _attn_section_v2_pallas (token padding to a sublane
    multiple, head-grouped bias layout, measured wblk fit boundaries)."""
    h, w, hp, wp, ws, shift = geom
    nw, n, c = x_win.shape
    hd = c // num_heads
    cdt = x_win.dtype
    itemsize = x_win.dtype.itemsize
    hidden = w1.shape[1]
    if hg is None:
        hg = _v2_hg_default(num_heads)
    assert num_heads % hg == 0
    assert bias.shape[0] == 1, f"v3 kernel needs a shared bias, got {bias.shape}"

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

    env_wblk = os.environ.get("SEGLAND_SWIN_V3_WBLK", "")
    if wblk is None and env_wblk:
        wblk = int(env_wblk)
    if wblk is None:
        # start from the v2 fit boundaries; the resident-weight set grows by
        # the MLP's 8c^2, so drop one notch at the widest stages
        wblk = 32 if c <= 192 else (16 if c <= 384 else 8)
        wblk = max(1, min(wblk, nw))

    grid = (-(-nw // wblk),)
    nw_padded = grid[0] * wblk
    if nw_padded != nw:
        x_win = jnp.pad(x_win, ((0, nw_padded - nw), (0, 0), (0, 0)))

    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(
        _block_v3_kernel, num_heads=num_heads, head_dim=hd, hg=hg,
        eps=eps, wblk=wblk, geom=(h, w, hp, wp, ws, shift, n_real))
    cp = {}
    # resident weights grow to 12c^2 (attn 4c^2 + MLP 8c^2): ~3.5 MB bf16 at
    # c=384, ~14 MB at c=768 — beyond the default scoped budget.  A larger
    # vmem_limit is required at the widest stages (measured round 4:
    # vmem_limit_bytes genuinely unlocks bigger kernels).
    vmem_mb = os.environ.get("SEGLAND_SWIN_V3_VMEM_MB", "")
    vmem_mb = int(vmem_mb) if vmem_mb else (96 if c >= 384 else None)
    if vmem_mb:
        cp["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw_padded, n, c), cdt),
        grid=grid,
        **cp,
        in_specs=[
            pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads // hg, n, hg * n),
                         lambda j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wblk, n, c), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * nw * n * c * (4 * c + 2 * hg * n + 2 * hidden),
            bytes_accessed=2 * nw * n * c * itemsize,
            transcendentals=nw * (num_heads * n * n + n * hidden),
        ),
        interpret=interpret,
    )(x_win, vec(gamma), vec(beta), wqkv.astype(cdt), vec(bqkv),
      wproj.astype(cdt), vec(bproj), bias_g, vec(gamma2), vec(beta2),
      w1.astype(cdt), vec(b1), w2.astype(cdt), vec(b2))
    if nw_padded != nw:
        out = out[:nw]
    return out[:, :n_real, :] if n_real != n else out


def _block_dispatch(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj,
                    bproj, bias, gamma2, beta2, w1, b1, w2, b2, num_heads,
                    eps, interpret, geom, hg):
    return _swin_block_v3_pallas(x_win, geom, gamma, beta, wqkv, bqkv, wproj,
                                 bproj, bias, gamma2, beta2, w1, b1, w2, b2,
                                 num_heads, eps, interpret, hg=hg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19, 20))
def _swin_block(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj,
                bproj, bias, gamma2, beta2, w1, b1, w2, b2, num_heads, eps,
                interpret, geom, hg):
    return _block_dispatch(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv,
                           wproj, bproj, bias, gamma2, beta2, w1, b1, w2, b2,
                           num_heads, eps, interpret, geom, hg)


def _swin_block_fwd(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj,
                    bproj, bias, gamma2, beta2, w1, b1, w2, b2, num_heads,
                    eps, interpret, geom, hg):
    out = _block_dispatch(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv,
                          wproj, bproj, bias, gamma2, beta2, w1, b1, w2, b2,
                          num_heads, eps, interpret, geom, hg)
    return out, (x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj,
                 bproj, bias, gamma2, beta2, w1, b1, w2, b2)


def _swin_block_bwd(num_heads, eps, interpret, geom, hg, saved, g):
    (x_win, mask_tok, regions, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
     gamma2, beta2, w1, b1, w2, b2) = saved

    def f(x_win_, gamma_, beta_, wqkv_, bqkv_, wproj_, bproj_, bias_,
          gamma2_, beta2_, w1_, b1_, w2_, b2_):
        return block_reference(x_win_, mask_tok, gamma_, beta_, wqkv_, bqkv_,
                               wproj_, bproj_, bias_, gamma2_, beta2_, w1_,
                               b1_, w2_, b2_, num_heads, eps, regions=regions)

    _, vjp = jax.vjp(f, x_win, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                     gamma2, beta2, w1, b1, w2, b2)
    (dx, dg, db, dwq, dbq, dwp, dbp, dbias, dg2, db2, dw1, db1_, dw2,
     db2_) = vjp(g)
    return (dx, jnp.zeros_like(mask_tok),
            None if regions is None else jnp.zeros_like(regions),
            dg, db, dwq, dbq, dwp, dbp, dbias, dg2, db2, dw1, db1_, dw2,
            db2_)


_swin_block.defvjp(_swin_block_fwd, _swin_block_bwd)


def swin_block_fused(x_win, mask_tok, gamma, beta, wqkv, bqkv, wproj, bproj,
                     bias, gamma2, beta2, w1, b1, w2, b2, num_heads,
                     eps=1e-5, regions=None, interpret=False, geom=None,
                     hg=None):
    """Whole swin block (attention section + LN2+MLP+residual) in ONE Pallas
    kernel — the round-5 answer to the measured ~6x Pallas block-DMA-rate gap
    (BASELINE.md round-4 addendum): the two-kernel block paid that slow path
    twice per block on the same [NW, N, C] activations.

    Contract matches swin_attn_section_fused plus the MLP params; geom is
    REQUIRED for the Pallas path (index-math masks).  Falls back to the XLA
    reference off-TPU.  Backward recomputes the XLA reference (training-safe,
    same pattern as the two-kernel path).
    """
    assert geom is not None, "swin_block_fused requires geom (v2-style masks)"
    if not interpret:
        from .pallas_mlp import force_interpret

        interpret = force_interpret()
    if not (interpret or jax.default_backend() == "tpu"):
        return block_reference(x_win, mask_tok, gamma, beta, wqkv, bqkv,
                               wproj, bproj, bias, gamma2, beta2, w1, b1, w2,
                               b2, num_heads, eps, regions=regions)
    return _swin_block(x_win, mask_tok, regions, gamma, beta, wqkv, bqkv,
                       wproj, bproj, bias, gamma2, beta2, w1, b1, w2, b2,
                       num_heads, eps, interpret, geom, hg)
