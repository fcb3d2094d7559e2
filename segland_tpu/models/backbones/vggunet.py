"""VGG16-BN encoder U-Net (reference networks/vggunet_pop.py:6-81), NHWC flax.

Fused backbone+decoder returning full-resolution 64-channel features.
Faithful quirk: the reference slices torchvision vgg16_bn.features so each
block's trailing ReLU is the first op of the NEXT slice — and because those
ReLUs are ``inplace=True``, calling down_k(x_k) MUTATES the saved skip
tensor x_k in place (vggunet_pop.py:71-75).  Net effect: skips x1..x4 are
POST-ReLU by the time the Up stages consume them, while x5 (never fed to a
later encoder slice) stays PRE-ReLU.  Verified against the live reference in
tests/test_parity_more_heads.py::test_vggunet_pop_parity.  Decoder ups use
bilinear 2x (align_corners=True) + DoubleConv with mid = in//2.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ...ops import packed as pk
from ...ops.resize import resize_bilinear
from ...ops.pooling import max_pool_2x2
from .fused import BNParams, ConvParams


def _cbr(x, feats, train, dtype, name, relu=True):
    x = nn.Conv(feats, (3, 3), padding=[(1, 1)] * 2, dtype=dtype, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x) if relu else x


def _bn_fold(scale, bias, mean, var):
    """Eval BatchNorm as a per-channel affine (s, b): y*s + b, fp32."""
    s = scale.astype(jnp.float32) / jnp.sqrt(var.astype(jnp.float32) + 1e-5)
    return s, bias.astype(jnp.float32) - mean.astype(jnp.float32) * s


def _packed_cbr(parent, xp, cin, cout, name, k, dtype, train=False):
    """conv3x3(+bias) + BN + relu on W-packed activations.

    Identical variable tree to _cbr (ConvParams/BNParams mirror nn.Conv /
    nn.BatchNorm names), so checkpoints and the .pth converter are
    unaffected.  Exact in fp32 (band-conv off-block weights are hard
    zeros); bf16 deltas are 1-ulp class (ops/packed.py docstring).

    train=True: per-channel batch stats from the packed layout — the k tile
    groups are disjoint W-pixel subsets of the same channels, so reducing
    over (B,H,Wp) x k equals the unpacked reduction; normalization and the
    momentum running-stat update follow flax nn.BatchNorm semantics exactly
    (same machinery as hrnet.py _packed_cb / BNParams batch_update)."""
    w, b = ConvParams((3, 3), cin, cout, use_bias=True,
                      name=f"{name}_conv", parent=parent)()
    if train:
        # conv_packed tiles the (Co,) bias itself — do not pre-tile
        y = pk.conv_packed(xp, w.astype(dtype), b.astype(dtype), 1, k)
        yf = y.astype(jnp.promote_types(y.dtype, jnp.float32)).reshape(-1, k, cout)
        bm = jnp.mean(yf, axis=(0, 1))
        bv = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1)) - bm * bm, 0.0)
        scale, bias, _, _ = BNParams(cout, name=f"{name}_bn",
                                     parent=parent)((bm, bv))
        s = scale / jnp.sqrt(bv + 1e-5)
        ab = bias - bm * s
        return nn.relu(y * jnp.tile(s, k).astype(y.dtype)
                       + jnp.tile(ab, k).astype(y.dtype))
    s, ab = _bn_fold(*BNParams(cout, name=f"{name}_bn", parent=parent)())
    wf = (w.astype(jnp.float32) * s[None, None, None]).astype(dtype)
    bf = (b.astype(jnp.float32) * s + ab).astype(dtype)
    return nn.relu(pk.conv_packed(xp, wf, bf, 1, k))


class VGGUNet(nn.Module):
    dtype: Any = jnp.float32
    # Eval-only W-packing (k=2) of the enc1 chain, the full-resolution
    # 64-channel encoder surface.  At C=64 every vector lane and MXU column
    # is half empty; packing two adjacent W-pixels into the channel dim runs
    # the glue at full lane density and the 3x3 convs as block-banded dense
    # MXU convs (ops/packed.py; measured on-chip: enc1 5.04 -> 4.14 ms at
    # b2 1024^2, model 59.1 -> 58.2 ms — benchmarks/vgg_packed_probe.py).
    packed: bool = True
    # Train-mode W-packing of the enc1 chain (same BNParams batch_update
    # machinery as HRNet packed_train; exact batch stats / grads).  Default
    # ON by measurement: 344.7 -> 301.3 ms/step (1.14x) at b4 768^2 on v5e
    # — BASELINE.md round-4 train-packing table.
    packed_train: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        use_packed = (self.packed and (not train or self.packed_train)
                      and x.shape[2] % 2 == 0)

        def block(x, feats, n_convs, name):
            """VGG block; returns (pre-ReLU snapshot, post-ReLU output)."""
            for i in range(n_convs - 1):
                x = _cbr(x, feats, train, dt, f"{name}_{i}")
            pre = _cbr(x, feats, train, dt, f"{name}_{n_convs-1}", relu=False)
            return pre, nn.relu(pre)

        # skips: post-ReLU for x1..x4 (the reference's inplace ReLUs mutate
        # them before the Up stages run), pre-ReLU for x5 (see module doc)
        if use_packed:
            xp = pk.pack(x.astype(dt), 2)
            xp = _packed_cbr(self, xp, 3, 64, "enc1_0", 2, dt, train=train)
            xp = _packed_cbr(self, xp, 64, 64, "enc1_1", 2, dt, train=train)
            x1 = pk.unpack(xp, 2)
        else:
            _, x1 = block(x, 64, 2, "enc1")
        _, x2 = block(max_pool_2x2(x1), 128, 2, "enc2")
        _, x3 = block(max_pool_2x2(x2), 256, 3, "enc3")
        _, x4 = block(max_pool_2x2(x3), 512, 3, "enc4")
        x5, _ = block(max_pool_2x2(x4), 512, 3, "enc5")

        def up(x_deep, skip, out_ch, mid_ch, name):
            u = resize_bilinear(x_deep, (x_deep.shape[1] * 2, x_deep.shape[2] * 2), align_corners=True)
            dh = skip.shape[1] - u.shape[1]
            dw = skip.shape[2] - u.shape[2]
            if dh or dw:
                u = jnp.pad(u, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
            y = jnp.concatenate([skip, u], axis=-1)
            y = _cbr(y, mid_ch, train, dt, f"{name}_dc0")
            y = _cbr(y, out_ch, train, dt, f"{name}_dc1")
            return y

        out = up(x5, x4, 256, 512, "up1")
        out = up(out, x3, 128, 256, "up2")
        out = up(out, x2, 64, 128, "up3")
        # Negative result (measured end-to-end, benchmarks/vggunet_bench.py):
        # packing up4's glue + dc1 the same way LOSES ~3 ms/b2 — splitting
        # dc0 into raw-conv -> pack-reshape -> affine breaks XLA's
        # conv+epilogue fusion and materializes the 1M-px conv output.
        out = up(out, x1, 64, 64, "up4")
        return out
