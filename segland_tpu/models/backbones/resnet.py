"""Dilated ResNet backbones (v1 7x7 stem, v2 deep 3-conv stem), NHWC flax.

Capability match for reference networks/backbones/resnet.py: stride-8/16
dilation modes, optional multigrid, ``last_relu`` control on layers 3/4, and
``base_forward`` returning the last feature map (or the 4-level pyramid for
v2 with return_list).  Param naming mirrors torch module paths (conv1, bn1,
layer1_0, ...) so the .pth converter is mechanical.
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ...ops.pooling import max_pool_3x3_s2


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    multi_grid: int = 1
    has_downsample: bool = False
    last_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        conv = lambda feats, k, s, d, name: nn.Conv(
            feats, (k, k), strides=(s, s),
            padding=[(d * (k // 2),) * 2] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype, name=name,
        )
        d = self.dilation * self.multi_grid
        residual = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, d, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, 1, "conv3")(out))
        if self.has_downsample:
            residual = bn("downsample_bn")(
                conv(self.planes * 4, 1, self.stride, 1, "downsample_conv")(x)
            )
        out = out + residual
        if self.last_relu:
            out = nn.relu(out)
        return out


def _make_layer(planes, blocks, in_planes, stride=1, dilation=1, multi_grid=False,
                last_relu=True, dtype=jnp.float32, prefix="layer"):
    grid = (1, 2, 4) if multi_grid else (1, 1, 1)
    mods = []
    has_ds = stride != 1 or in_planes != planes * 4
    mods.append(Bottleneck(planes, stride, dilation, grid[0], has_ds, True, dtype, name=f"{prefix}_0"))
    for i in range(1, blocks):
        use_relu = True if i != blocks - 1 else last_relu
        mods.append(Bottleneck(planes, 1, dilation, grid[i % len(grid)], False, use_relu, dtype, name=f"{prefix}_{i}"))
    return mods


class ResNet(nn.Module):
    """v1: 7x7 stem (reference resnet.py:80-136)."""
    layers: Sequence[int]
    dilated: bool = True
    multi_grid: bool = False
    os: int = 8
    relu_l3: bool = True
    relu_l4: bool = True
    deep_stem: bool = False  # v2: three 3x3 convs (reference resnet.py:138-208)
    dtype: Any = jnp.float32

    # channel counts exposed like the reference (deep_channels/dsn_channels)
    deep_channels: int = 2048
    dsn_channels: int = 1024
    filters = (256, 512, 1024, 2048)

    def setup(self):
        dt = self.dtype
        if self.deep_stem:
            self.conv1 = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, use_bias=False, dtype=dt, name="conv1")
            self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name="bn1")
            self.conv2 = nn.Conv(64, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=dt, name="conv2")
            self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name="bn2")
            self.conv3 = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=dt, name="conv3")
            self.bn3 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name="bn3")
            in_planes = 128
        else:
            self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False, dtype=dt, name="conv1")
            self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name="bn1")
            in_planes = 64

        l = self.layers
        self.layer1 = _make_layer(64, l[0], in_planes, dtype=dt, prefix="layer1")
        self.layer2 = _make_layer(128, l[1], 256, stride=2, dtype=dt, prefix="layer2")
        if self.dilated:
            if self.os == 8:
                l3 = dict(stride=1, dilation=2)
                l4 = dict(stride=1, dilation=4, multi_grid=self.multi_grid)
            else:
                l3 = dict(stride=2, dilation=1)
                l4 = dict(stride=1, dilation=2, multi_grid=self.multi_grid)
        else:
            l3 = dict(stride=2, dilation=1)
            l4 = dict(stride=2, dilation=1)
        self.layer3 = _make_layer(256, l[2], 512, last_relu=self.relu_l3, dtype=dt, prefix="layer3", **l3)
        self.layer4 = _make_layer(512, l[3], 1024, last_relu=self.relu_l4, dtype=dt, prefix="layer4", **l4)

    def _stem(self, x, train):
        ra = not train
        if self.deep_stem:
            x = nn.relu(self.bn1(self.conv1(x), use_running_average=ra))
            x = nn.relu(self.bn2(self.conv2(x), use_running_average=ra))
            x = nn.relu(self.bn3(self.conv3(x), use_running_average=ra))
        else:
            x = nn.relu(self.bn1(self.conv1(x), use_running_average=ra))
        return max_pool_3x3_s2(x)

    def __call__(self, x, train: bool = False, return_list: bool = False):
        x = self._stem(x, train)
        for blk in self.layer1:
            x = blk(x, train)
        x1 = x
        for blk in self.layer2:
            x = blk(x, train)
        x2 = x
        for blk in self.layer3:
            x = blk(x, train)
        x3 = x
        for blk in self.layer4:
            x = blk(x, train)
        if return_list:
            # pyramid ordering [x4, x3, x2, x1] matches reference
            # resnet.py:186-201 (ResNetv2.base_forward(return_list=True))
            return [x, x3, x2, x1]
        return x


def resnet50(dtype=jnp.float32, **kw):
    return ResNet(layers=(3, 4, 6, 3), dtype=dtype, **kw)


def resnet101(dtype=jnp.float32, **kw):
    return ResNet(layers=(3, 4, 23, 3), dtype=dtype, **kw)


def resnet50v2(dtype=jnp.float32, **kw):
    return ResNet(layers=(3, 4, 6, 3), deep_stem=True, dtype=dtype, **kw)


def resnet101v2(dtype=jnp.float32, **kw):
    return ResNet(layers=(3, 4, 23, 3), deep_stem=True, dtype=dtype, **kw)
