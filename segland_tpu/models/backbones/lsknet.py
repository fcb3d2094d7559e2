"""LSKNet backbone (tiny), NHWC flax.

Match for reference networks/backbones/lsknet.py: overlapping patch embeds
(7x7/s4 then 3x3/s2) with BN, blocks of BN -> LSK attention -> layer-scale
residual and BN -> conv-MLP (with 3x3 depthwise) -> layer-scale residual,
per-stage output LayerNorm.  LSK block: dual large-kernel depthwise (5x5 and
7x7 dilation 3), channel-halving 1x1s, avg/max-pool spatial gating through a
7x7 conv sigmoid, re-projection, multiplicative gate.
Dropout/DropPath are identity at eval; at train=True the reference tiny
config applies dropout 0.1 in the conv-MLP and stochastic depth 0.1 with the
linspace decay rule (reference lsknet.py:134,193-203).

TPU lane packing: the C=32 stage (the single most expensive: 3 blocks at
256^2 for a 1024^2 tile) runs every vector lane at 25% occupancy.  With
``packed=True`` (default) its 1x1 convs and the three depthwise convs
execute in a k=4 pixel-packed layout (ops/packed.py): reshape-free
boundaries, block-diagonal matmuls, and block-banded dense MXU convs —
measured 1.40x/block (20.4 -> 14.6 ms; k=2 at C=64 measured slower and is
gated off in pack_k).  fp32 results are exact
(injected weights are hard zeros; fp32 accumulation); bf16 differs by <=1
output ulp — the same delta class as the fused Pallas kernels.  Parameter
trees are identical in both modes (ConvParams holders mirror nn.Conv).
"""

from typing import Any, Sequence

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from .droppath import DropPath, drop_path_rates
from .fused import ConvParams
from ...ops import packed as pk


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


def _conv_apply(x, w, b, *, dil=1, groups=1, dtype=jnp.float32):
    """nn.Conv-equivalent SAME-padded stride-1 conv from raw params."""
    kh = w.shape[0]
    pad = dil * (kh // 2)
    y = lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), [(pad, pad)] * 2,
        rhs_dilation=(dil, dil), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return y + b.astype(dtype)


class LSKBlockCore(nn.Module):
    dim: int
    packed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        dt = self.dtype
        w0, b0 = ConvParams((5, 5), 1, d, name="conv0")()
        wsp, bsp = ConvParams((7, 7), 1, d, name="conv_spatial")()
        w1, b1 = ConvParams((1, 1), d, d // 2, name="conv1")()
        w2, b2 = ConvParams((1, 1), d, d // 2, name="conv2")()
        wsq, bsq = ConvParams((7, 7), 2, 2, name="conv_squeeze")()
        wc, bc = ConvParams((1, 1), d // 2, d, name="conv")()

        k = pk.pack_k(d) if self.packed else 1
        if k > 1 and x.shape[2] % k == 0:
            xp = pk.pack(x, k)
            a1p = pk.dw_conv_packed(xp, w0.astype(dt), b0.astype(dt), 1, k)
            a2p = pk.dw_conv_packed(a1p, wsp.astype(dt), bsp.astype(dt), 3, k)
            a1cp = pk.conv1x1_packed(a1p, w1[0, 0].astype(dt), b1.astype(dt), k)
            a2cp = pk.conv1x1_packed(a2p, w2[0, 0].astype(dt), b2.astype(dt), k)
            attn1, attn2 = pk.unpack(a1cp, k), pk.unpack(a2cp, k)
        else:
            a1 = _conv_apply(x, w0, b0, groups=d, dtype=dt)
            a2 = _conv_apply(a1, wsp, bsp, dil=3, groups=d, dtype=dt)
            attn1 = _conv_apply(a1, w1, b1, dtype=dt)
            attn2 = _conv_apply(a2, w2, b2, dtype=dt)
        attn = jnp.concatenate([attn1, attn2], axis=-1)
        avg_attn = jnp.mean(attn, axis=-1, keepdims=True)
        max_attn = jnp.max(attn, axis=-1, keepdims=True)
        agg = jnp.concatenate([avg_attn, max_attn], axis=-1)
        sig = nn.sigmoid(_conv_apply(agg, wsq, bsq, dtype=dt))
        attn = attn1 * sig[..., 0:1] + attn2 * sig[..., 1:2]
        if k > 1 and x.shape[2] % k == 0:
            attn = pk.unpack(
                pk.conv1x1_packed(pk.pack(attn, k), wc[0, 0].astype(dt),
                                  bc.astype(dt), k), k)
        else:
            attn = _conv_apply(attn, wc, bc, dtype=dt)
        return x * attn


class LSKAttention(nn.Module):
    dim: int
    packed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        dt = self.dtype
        shortcut = x
        wq, bq = ConvParams((1, 1), d, d, name="proj_1")()
        wp, bp = ConvParams((1, 1), d, d, name="proj_2")()
        k = pk.pack_k(d) if self.packed else 1
        use_pk = k > 1 and x.shape[2] % k == 0
        if use_pk:
            hp = pk.conv1x1_packed(pk.pack(x.astype(dt), k), wq[0, 0].astype(dt),
                                   bq.astype(dt), k)
            h = pk.unpack(nn.gelu(hp, approximate=False), k)
        else:
            h = nn.gelu(_conv_apply(x, wq, bq, dtype=dt), approximate=False)
        h = LSKBlockCore(d, packed=self.packed, dtype=dt, name="spatial_gating_unit")(h)
        if use_pk:
            h = pk.unpack(
                pk.conv1x1_packed(pk.pack(h, k), wp[0, 0].astype(dt),
                                  bp.astype(dt), k), k)
        else:
            h = _conv_apply(h, wp, bp, dtype=dt)
        return h + shortcut


class LSKStageBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.1
    drop_path: float = 0.0
    packed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        dt = self.dtype
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (d,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (d,))
        dp = self.drop_path > 0.0 and train
        dp1 = DropPath(self.drop_path, name="drop_path1")
        dp2 = DropPath(self.drop_path, name="drop_path2")
        h = _bn(train, dt, "norm1")(x)
        h = LSKAttention(d, packed=self.packed, dtype=dt, name="attn")(h)
        # cast the fp32 layer-scale params: a bare `ls * h` promotes every
        # block output to fp32 in bf16 mode (2x HBM traffic network-wide)
        h = ls1.astype(h.dtype) * h
        x = x + (dp1(h, train) if dp else h)
        h = _bn(train, dt, "norm2")(x)
        hidden = int(d * self.mlp_ratio)
        wf1, bf1 = ConvParams((1, 1), d, hidden, name="mlp_fc1")()
        wdw, bdw = ConvParams((3, 3), 1, hidden, name="mlp_dwconv")()
        wf2, bf2 = ConvParams((1, 1), hidden, d, name="mlp_fc2")()
        k = pk.pack_k(d) if self.packed else 1
        if k > 1 and x.shape[2] % k == 0:
            hp = pk.conv1x1_packed(pk.pack(h.astype(dt), k), wf1[0, 0].astype(dt),
                                   bf1.astype(dt), k)
            h = pk.unpack(hp, k)
        else:
            h = _conv_apply(h, wf1, bf1, dtype=dt)
        h = _conv_apply(h, wdw, bdw, groups=hidden, dtype=dt)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop1")(h)
        if k > 1 and x.shape[2] % k == 0:
            h = pk.unpack(
                pk.conv1x1_packed(pk.pack(h, k), wf2[0, 0].astype(dt),
                                  bf2.astype(dt), k), k)
        else:
            h = _conv_apply(h, wf2, bf2, dtype=dt)
        h = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop2")(h)
        h = ls2.astype(h.dtype) * h
        return x + (dp2(h, train) if dp else h)


class LSKNet(nn.Module):
    embed_dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (3, 3, 5, 2)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    drop_rate: float = 0.1
    drop_path_rate: float = 0.1  # reference lsknet.py:201 (lsknet_tiny)
    packed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        dpr = drop_path_rates(self.drop_path_rate, self.depths)
        cur = 0
        for i in range(len(self.depths)):
            k, s = (7, 4) if i == 0 else (3, 2)
            x = nn.Conv(self.embed_dims[i], (k, k), strides=(s, s), padding=[(k // 2,) * 2] * 2,
                        dtype=self.dtype, name=f"patch_embed{i+1}_proj")(x)
            x = _bn(train, self.dtype, f"patch_embed{i+1}_norm")(x)
            for j in range(self.depths[i]):
                x = LSKStageBlock(self.embed_dims[i], self.mlp_ratios[i], self.drop_rate,
                                  drop_path=dpr[cur + j], packed=self.packed,
                                  dtype=self.dtype, name=f"block{i+1}_{j}")(x, train)
            cur += self.depths[i]
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{i+1}")(x)
            outs.append(x)
        return outs  # fine->coarse


def lsknet_tiny(dtype=jnp.float32, packed: bool = True):
    return LSKNet(dtype=dtype, packed=packed)
