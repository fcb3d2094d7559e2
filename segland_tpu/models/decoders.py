"""Decoder zoo (NHWC flax): PSP, PSP+, ASPP, UperNet+, FPN-OCR, Simple, HRFPN.

One decoder per reference head family:
  psp       -> networks/pspnet_pop.py:8-35        (PSPModule)
  pspplus   -> networks/pspplus_pop.py:37-54      (PSP on x4 + low-level x3)
  aspp      -> networks/deeplab_pop.py:46-67      (_ASPP, rates 6/12/18)
  upernetplus -> networks/swin_pop.py:104-173     (FPN top-down + scale heads)
  fpn_ocr   -> networks/convnext_pop.py:8-28      (concat-upsampled pyramid)
  simple    -> networks/lsk_pop.py:104-165        (gated lateral FPN)
  hrfpn     -> networks/seghr_pop.py:8-24         (parameterless concat)

All decoders take either a single stride-8 feature map or a 4-level pyramid
[x4, x3, x2, x1] (coarse->fine) and return a [B,h,w,d_model] map.
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops.pooling import adaptive_avg_pool
from ..ops.resize import resize_bilinear


def _bn(train, dtype, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class PSPModule(nn.Module):
    """Pyramid scene parsing head (reference networks/pspnet_pop.py:8-35).

    stages: adaptive_avg_pool(s) -> 1x1 conv (no bias) -> BN -> ReLU ->
    bilinear up (align_corners=False); concat with input; bottleneck =
    3x3 conv (no bias) -> BN -> ReLU -> 1x1 conv (bias).
    """
    out_features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        h, w = feats.shape[1], feats.shape[2]
        priors = []
        for i, s in enumerate(self.sizes):
            p = adaptive_avg_pool(feats, s)
            p = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype, name=f"stages_{i}_conv")(p)
            p = _bn(train, self.dtype, name=f"stages_{i}_bn")(p)
            p = nn.relu(p)
            priors.append(resize_bilinear(p, (h, w), align_corners=False))
        priors.append(feats)
        x = jnp.concatenate(priors, axis=-1)
        x = nn.Conv(self.out_features, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype, name="bottleneck_conv")(x)
        x = _bn(train, self.dtype, name="bottleneck_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (1, 1), dtype=self.dtype, name="bottleneck_out")(x)
        return x


class PSPPlusDecoder(nn.Module):
    """PSP on x4 + reduced low-level x3, concat + fuse
    (reference networks/pspplus_pop.py:37-54)."""
    out_features: int = 512
    low_features: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x4, x3 = feats[0], feats[1]
        psp = PSPModule(self.out_features, dtype=self.dtype, name="psp")(x4, train)
        low = nn.Conv(self.low_features, (1, 1), use_bias=False, dtype=self.dtype, name="low_conv")(x3)
        low = _bn(train, self.dtype, name="low_bn")(low)
        low = nn.relu(low)
        low = resize_bilinear(low, psp.shape[1:3], align_corners=False)
        x = jnp.concatenate([psp, low], axis=-1)
        x = nn.Conv(self.out_features, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype, name="fc_conv")(x)
        x = _bn(train, self.dtype, name="fc_bn")(x)
        x = nn.relu(x)
        return x


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference networks/deeplab_pop.py:46-67):
    1x1 + three 3x3 dilated (6/12/18) + image pooling, concat -> 1x1 fuse."""
    out_features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        h, w = feats.shape[1], feats.shape[2]

        def cbr(x, k, d, name):
            x = nn.Conv(self.out_features, (k, k), padding=[(d * (k // 2),) * 2] * 2,
                        kernel_dilation=(d, d), use_bias=False, dtype=self.dtype, name=f"{name}_conv")(x)
            x = _bn(train, self.dtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        branches = [cbr(feats, 1, 1, "b0")]
        for i, r in enumerate(self.rates):
            branches.append(cbr(feats, 3, r, f"b{i+1}"))
        pooled = jnp.mean(feats, axis=(1, 2), keepdims=True)
        pooled = cbr(pooled, 1, 1, "pool")
        branches.append(jnp.broadcast_to(pooled, (feats.shape[0], h, w, self.out_features)))
        x = jnp.concatenate(branches, axis=-1)
        x = cbr(x, 1, 1, "project")
        return x


class UperNetPlusDecoder(nn.Module):
    """FPN top-down pathway + per-level scale heads, summed at 1/4 res
    (reference networks/swin_pop.py:104-173, UperNet_Decoder_Plus)."""
    out_features: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: [x4, x3, x2, x1] coarse->fine
        levels = list(feats)

        def cbr(x, k, name):
            x = nn.Conv(self.out_features, (k, k), padding=[(k // 2,) * 2] * 2,
                        use_bias=False, dtype=self.dtype, name=f"{name}_conv")(x)
            x = _bn(train, self.dtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        laterals = [cbr(lv, 1, f"lateral_{i}") for i, lv in enumerate(levels)]
        # top-down accumulation (coarse -> fine)
        for i in range(1, len(laterals)):
            up = resize_bilinear(laterals[i - 1], laterals[i].shape[1:3], align_corners=False)
            laterals[i] = laterals[i] + up
        target_hw = laterals[-1].shape[1:3]
        out = None
        for i, lat in enumerate(laterals):
            head = cbr(lat, 3, f"scale_head_{i}")
            head = resize_bilinear(head, target_hw, align_corners=False)
            out = head if out is None else out + head
        return out


class FPNOCRDecoder(nn.Module):
    """Upsample all 4 levels to 1/4 res, concat, 1x1 conv + LayerNorm
    (reference networks/convnext_pop.py:8-28, FPN_Seg_OCR_Decoder)."""
    out_features: int = 192
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        target_hw = feats[-1].shape[1:3]
        ups = [resize_bilinear(f, target_hw, align_corners=False) for f in feats]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype, name="fuse_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="fuse_ln")(x)
        x = nn.relu(x)
        return x


class SimpleDecoder(nn.Module):
    """Lateral convs gated by a sigmoid global semantic embedding of the top
    level, per-level scale heads, summed (reference networks/lsk_pop.py:104-165)."""
    out_features: int = 192
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: [x4, x3, x2, x1] coarse->fine
        top = feats[0]
        sem = jnp.mean(top, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        sem = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype, name="semantic_conv")(sem)
        gate = nn.sigmoid(sem)

        def cbr(x, k, name):
            x = nn.Conv(self.out_features, (k, k), padding=[(k // 2,) * 2] * 2,
                        use_bias=False, dtype=self.dtype, name=f"{name}_conv")(x)
            x = _bn(train, self.dtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        target_hw = feats[-1].shape[1:3]
        out = None
        for i, f in enumerate(feats):
            lat = cbr(f, 1, f"lateral_{i}") * gate
            head = cbr(lat, 3, f"scale_head_{i}")
            head = resize_bilinear(head, target_hw, align_corners=False)
            out = head if out is None else out + head
        return out


class HRFPNDecoder(nn.Module):
    """Parameterless: upsample the 4 HRNet branches to the finest resolution
    and concat (reference networks/seghr_pop.py:8-24)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # HRNet branches fine->coarse; finest first
        target_hw = feats[0].shape[1:3]
        ups = [feats[0]] + [resize_bilinear(f, target_hw, align_corners=False) for f in feats[1:]]
        return jnp.concatenate(ups, axis=-1)


DECODERS = {
    "psp": PSPModule,
    "pspplus": PSPPlusDecoder,
    "aspp": ASPP,
    "upernetplus": UperNetPlusDecoder,
    "fpn_ocr": FPNOCRDecoder,
    "simple": SimpleDecoder,
    "hrfpn": HRFPNDecoder,
}
