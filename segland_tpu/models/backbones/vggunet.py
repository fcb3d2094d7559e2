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

from ...ops.resize import resize_bilinear
from ...ops.pooling import max_pool_2x2


def _cbr(x, feats, train, dtype, name, relu=True):
    x = nn.Conv(feats, (3, 3), padding=[(1, 1)] * 2, dtype=dtype, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x) if relu else x


class VGGUNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def block(x, feats, n_convs, name):
            """VGG block; returns (pre-ReLU snapshot, post-ReLU output)."""
            for i in range(n_convs - 1):
                x = _cbr(x, feats, train, dt, f"{name}_{i}")
            pre = _cbr(x, feats, train, dt, f"{name}_{n_convs-1}", relu=False)
            return pre, nn.relu(pre)

        # skips: post-ReLU for x1..x4 (the reference's inplace ReLUs mutate
        # them before the Up stages run), pre-ReLU for x5 (see module doc)
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
        out = up(out, x1, 64, 64, "up4")
        return out
