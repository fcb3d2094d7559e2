"""Backbone factory, string keys matching the reference
(networks/backbones/__init__.py:8-43)."""

import jax.numpy as jnp


def get_backbone(name: str, dtype=jnp.float32, fused_mlp: bool = False,
                 fused_attn: bool = False, **kw):
    """fused_mlp / fused_attn enable the Pallas LN+MLP and attention-section
    kernels in transformer-family backbones (swin/convnext); ignored by
    conv-only families."""
    from . import resnet

    if name == "resnet10":
        # tiny 1-block-per-stage variant for smoke/sharding tests and dryruns
        return resnet.ResNet(layers=(1, 1, 1, 1), dtype=dtype, **kw)
    if name == "resnet50":
        return resnet.resnet50(dtype=dtype, **kw)
    if name == "resnet101":
        return resnet.resnet101(dtype=dtype, **kw)
    if name == "resnet50v2":
        return resnet.resnet50v2(dtype=dtype, **kw)
    if name == "resnet101v2":
        return resnet.resnet101v2(dtype=dtype, **kw)
    if name in ("swin-t", "swin-s", "swin-b", "swin-l"):
        from . import swin

        return swin.get_swin(name, dtype=dtype, fused_mlp=fused_mlp,
                             fused_attn=fused_attn)
    if name in ("hr-w18", "hr-w32", "hr-w48"):
        from . import hrnet

        return hrnet.get_hrnet(name, dtype=dtype, **kw)
    if name == "convnext-t":
        from . import convnext

        return convnext.convnext_tiny(dtype=dtype, fused_mlp=fused_mlp)
    if name == "lsk-t":
        from . import lsknet

        return lsknet.lsknet_tiny(dtype=dtype, **kw)
    if name == "vgg16bn-unet":
        from . import vggunet

        return vggunet.VGGUNet(dtype=dtype, **kw)
    raise ValueError(f"unknown backbone: {name}")


def backbone_filters(name: str):
    """Per-level channel counts (reference get_filters()/.filters)."""
    if name.startswith("resnet"):
        return (2048, 1024, 512, 256)  # coarse->fine [x4,x3,x2,x1]
    if name == "swin-t":
        return (96, 192, 384, 768)
    if name == "swin-s":
        return (96, 192, 384, 768)
    if name == "swin-b":
        return (128, 256, 512, 1024)
    if name == "swin-l":
        return (192, 384, 768, 1536)
    if name == "hr-w18":
        return (18, 36, 72, 144)
    if name == "hr-w32":
        return (32, 64, 128, 256)
    if name == "hr-w48":
        return (48, 96, 192, 384)
    if name == "convnext-t":
        return (96, 192, 384, 768)
    if name == "lsk-t":
        return (32, 64, 160, 256)
    if name == "vgg16bn-unet":
        return (64,)
    raise ValueError(f"unknown backbone: {name}")
