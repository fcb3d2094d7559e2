"""HRNetV2 backbone (W18/W32/W48), NHWC flax.

Behavioral match for reference networks/backbones/hrnet.py:279-494: 2x
stride-2 3x3 stem, stage1 = 4 bottlenecks (64->256), transitions adding a
branch per stage, stages of [1,1,4,3] HighResolution modules with [2,3,4]
branches x 4 BasicBlocks and full SUM fuse lattices (upsamples
align_corners=True).  Returns the 4 parallel-resolution branch outputs
FINE->COARSE.  Param names mirror torch module paths for the converter
(stage3_2_branches_1_0 <-> stage3.2.branches.1.0, ...).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ...ops import packed as pk
from ...ops.resize import resize_bilinear
from .fused import BNParams, ConvParams

_FILTERS = {
    "hr-w18": (18, 36, 72, 144),
    "hr-w32": (32, 64, 128, 256),
    "hr-w48": (48, 96, 192, 384),
}


class _Ops:
    """Name-scoped conv/bn helpers bound to a parent @nn.compact module."""

    def __init__(self, parent, train, dtype, packed=False, packed_train=False):
        self.p = parent
        self.train = train
        self.dtype = dtype
        self.packed = packed
        self.packed_train = packed_train

    def conv(self, x, feats, k, s, name, dilation=1):
        pad = dilation * (k // 2)
        return nn.Conv(
            feats, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
            kernel_dilation=(dilation, dilation), use_bias=False,
            dtype=self.dtype, name=f"{name}_conv", parent=self.p,
        )(x)

    def bn(self, x, name):
        return nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=f"{name}_bn", parent=self.p,
        )(x)

    def cb(self, x, feats, k, s, name):
        return self.bn(self.conv(x, feats, k, s, name), name)

    def cbr(self, x, feats, k, s, name):
        return nn.relu(self.cb(x, feats, k, s, name))


def _basic_block(ops, x, planes, name, stride=1, has_down=False):
    residual = x
    out = ops.cbr(x, planes, 3, stride, f"{name}_c1")
    out = ops.cb(out, planes, 3, 1, f"{name}_c2")
    if has_down:
        residual = ops.cb(x, planes, 1, stride, f"{name}_down")
    return nn.relu(out + residual)


def _bottleneck(ops, x, planes, name, stride=1, has_down=False):
    residual = x
    out = ops.cbr(x, planes, 1, 1, f"{name}_c1")
    out = ops.cbr(out, planes, 3, stride, f"{name}_c2")
    out = ops.cb(out, planes * 4, 1, 1, f"{name}_c3")
    if has_down:
        residual = ops.cb(x, planes * 4, 1, stride, f"{name}_down")
    return nn.relu(out + residual)


def _packed_cb(ops, xp, ch, name, k, relu):
    """conv3x3 + BatchNorm (+relu) on W-packed activations; identical
    variable tree to ops.cb/cbr (ConvParams/BNParams mirror nn.Conv/
    nn.BatchNorm names).

    Eval: BN folded to a per-channel affine on running stats.  Train: exact
    per-channel batch stats from the packed layout — the k tile groups are
    disjoint W-pixel subsets of the same channels, so reducing over
    (B,H,Wp) x k gives the same mean/E[x^2] as the unpacked reduction —
    normalization + the nn.BatchNorm(momentum) running-stat update follow
    flax semantics.  Gradients are exact: dense_band_weights is a linear
    (constant-placement einsum) function of the conv kernel."""
    w, _ = ConvParams((3, 3), ch, ch, use_bias=False,
                      name=f"{name}_conv", parent=ops.p)()
    y = pk.conv_packed(xp, w.astype(ops.dtype), None, 1, k)
    if ops.train:
        # promote like flax _compute_stats (fp32 stats for bf16/fp32 runs,
        # fp64 kept in fp64 test runs)
        yf = y.astype(jnp.promote_types(y.dtype, jnp.float32)).reshape(-1, k, ch)
        bm = jnp.mean(yf, axis=(0, 1))
        bv = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1)) - bm * bm, 0.0)
        scale, bias, _, _ = BNParams(ch, name=f"{name}_bn",
                                     parent=ops.p)((bm, bv))
        s = scale / jnp.sqrt(bv + 1e-5)
        aff_b = bias - bm * s
    else:
        scale, bias, mean, var = BNParams(ch, name=f"{name}_bn", parent=ops.p)()
        s = scale / jnp.sqrt(var + 1e-5)
        aff_b = bias - mean * s
    y = y * jnp.tile(s, k).astype(y.dtype) + jnp.tile(aff_b, k).astype(y.dtype)
    return nn.relu(y) if relu else y


def _packed_branch(ops, x, ch, names, k):
    """A chain of BasicBlocks entirely in the W-packed layout.

    The win is NOT the convs (a bare 3x3 32->32 conv measures 0.19 ms at
    branch0 shapes) but the elementwise epilogues: BN-affine/relu/residual
    at C=32 run at 25% lane occupancy and cost 6x the conv
    (benchmarks/hrnet_branch_probe.py).  Packed, every elementwise op runs
    at full lane density; the convs become block-banded dense MXU convs
    (exact in fp32: injected off-block weights are hard zeros)."""
    xp = pk.pack(x.astype(ops.dtype), k)
    for nm in names:
        res = xp
        h = _packed_cb(ops, xp, ch, f"{nm}_c1", k, relu=True)
        h = _packed_cb(ops, h, ch, f"{nm}_c2", k, relu=False)
        xp = nn.relu(h + res)
    return pk.unpack(xp, k)


def _hr_module(ops, xs, channels: Sequence[int], name: str):
    """One HighResolutionModule: 4 BasicBlocks per branch + SUM fuse lattice
    (reference hrnet.py:124-271)."""
    n = len(xs)
    ys = []
    for b in range(n):
        x = xs[b]
        # min_k=2: unlike the LSK depthwise case, even half-full lanes win
        # for dense 3x3 chains (branch1 0.65 -> 0.10 ms/module measured) —
        # the band kernel only inflates dense FLOPs by kw_p*k/kh = 2x
        kp = (pk.pack_k(channels[b], min_k=2)
              if ops.packed and (not ops.train or ops.packed_train) else 1)
        if kp > 1 and x.shape[2] % kp == 0 and x.shape[-1] == channels[b]:
            ys.append(_packed_branch(
                ops, x, channels[b],
                [f"{name}_branches_{b}_{k}" for k in range(4)], kp))
            continue
        for k in range(4):
            has_down = k == 0 and x.shape[-1] != channels[b]
            x = _basic_block(ops, x, channels[b], f"{name}_branches_{b}_{k}", has_down=has_down)
        ys.append(x)
    if n == 1:
        return ys
    fused = []
    for i in range(n):
        y = None
        for j in range(n):
            if j == i:
                t = ys[j]
            elif j > i:
                t = ops.cb(ys[j], channels[i], 1, 1, f"{name}_fuse_{i}_{j}")
                t = resize_bilinear(t, ys[i].shape[1:3], align_corners=True)
            else:
                t = ys[j]
                for k in range(i - j):
                    last = k == i - j - 1
                    feats = channels[i] if last else channels[j]
                    t = ops.cb(t, feats, 3, 2, f"{name}_fuse_{i}_{j}_{k}")
                    if not last:
                        t = nn.relu(t)
            y = t if y is None else y + t
        fused.append(nn.relu(y))
    return fused


class HighResolutionNet(nn.Module):
    filters: Sequence[int] = (32, 64, 128, 256)
    packed: bool = True  # W-packed branch chains (see _packed_branch)
    # Train-mode packing of the same chains (exact batch stats from the
    # packed layout, exact grads through the linear band-weight transform).
    # Measured 1.59x on the w32 train step at the reference base config
    # (benchmarks/hrnet_train_probe.py: 230.7 -> 145.4 ms b4 768^2).
    packed_train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ops = _Ops(self, train, self.dtype, packed=self.packed,
                   packed_train=self.packed_train)
        f = list(self.filters)

        # stem: two stride-2 3x3 convs (hrnet.py:296-303)
        x = ops.cbr(x, 64, 3, 2, "stem1")
        x = ops.cbr(x, 64, 3, 2, "stem2")
        # stage1: 4 bottlenecks 64->256
        for k in range(4):
            x = _bottleneck(ops, x, 64, f"layer1_{k}", has_down=(k == 0))

        # transition1: branch0 3x3 s1 (256->f0), branch1 3x3 s2 (256->f1)
        xs = [
            ops.cbr(x, f[0], 3, 1, "transition1_0_0"),
            ops.cbr(x, f[1], 3, 2, "transition1_1_0"),
        ]
        xs = _hr_module(ops, xs, f[:2], "stage2_0")

        # transition2: new branch from the COARSEST existing (hrnet.py:478)
        xs = xs + [ops.cbr(xs[-1], f[2], 3, 2, "transition2_2_0")]
        for m in range(4):
            xs = _hr_module(ops, xs, f[:3], f"stage3_{m}")

        xs = xs + [ops.cbr(xs[-1], f[3], 3, 2, "transition3_3_0")]
        for m in range(3):
            xs = _hr_module(ops, xs, f[:4], f"stage4_{m}")

        return xs  # fine->coarse, 4 branches


def get_hrnet(name: str, dtype=jnp.float32, packed: bool = True,
              packed_train: bool = True) -> HighResolutionNet:
    return HighResolutionNet(filters=_FILTERS[name], packed=packed,
                             packed_train=packed_train, dtype=dtype)
