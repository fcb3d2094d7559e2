"""Model registry — explicit dict replacing the reference's eval()-based
selection (reference train_base.py:184: eval('networks.'+args.model+'.GFSS_Model')).

Keys are the reference model names; each maps to a builder
``(backbone, n_base, n_novel, is_ft, os, dilated, dtype) -> nn.Module``.
"""

import jax.numpy as jnp

from .pop import GFSSModel
from .pspnet_plain import PlainPSPNet

# model name -> (decoder_name, default_backbone)
_POP_CONFIGS = {
    "pspnet_pop": ("psp", "resnet50"),        # reference networks/pspnet_pop.py
    "pspplus_pop": ("pspplus", "resnet50v2"),  # reference networks/pspplus_pop.py
    "deeplab_pop": ("aspp", "resnet50"),       # reference networks/deeplab_pop.py
    "swin_pop": ("upernetplus", "swin-s"),     # reference networks/swin_pop.py
    "convnext_pop": ("fpn_ocr", "convnext-t"),  # reference networks/convnext_pop.py
    "lsk_pop": ("simple", "lsk-t"),            # reference networks/lsk_pop.py
    "seghr_pop": ("hrfpn", "hr-w32"),          # reference networks/seghr_pop.py
    "vggunet_pop": ("identity", "vgg16bn-unet"),  # reference networks/vggunet_pop.py
}


def build_model(model: str, backbone: str | None = None, n_base: int = 7,
                n_novel: int = 0, is_ft: bool = False, os: int = 8,
                dilated: bool = True, dtype=jnp.float32, fused_mlp: bool = False,
                fused_attn: bool = False, packed_train=None):
    if model == "pspnet":
        if packed_train is not None:
            raise ValueError("packed_train is not supported by the plain "
                             "pspnet model (resnet backbones have no packed "
                             "path)")
        return PlainPSPNet(
            backbone_name=backbone or "resnet50", n_base=n_base, n_novel=n_novel,
            is_ft=is_ft, os=os, dilated=dilated, dtype=dtype,
        )
    if model not in _POP_CONFIGS:
        raise ValueError(f"unknown model: {model!r}; known: {sorted(_POP_CONFIGS) + ['pspnet']}")
    decoder, default_bk = _POP_CONFIGS[model]
    return GFSSModel(
        backbone_name=backbone or default_bk, decoder_name=decoder,
        n_base=n_base, n_novel=n_novel, is_ft=is_ft, os=os, dilated=dilated,
        fused_mlp=fused_mlp, fused_attn=fused_attn, packed_train=packed_train,
        dtype=dtype,
    )


MODEL_NAMES = sorted(_POP_CONFIGS) + ["pspnet"]
