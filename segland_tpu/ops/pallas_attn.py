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
