"""Plain (non-POP) PSPNet baseline head — reference networks/pspnet.py.

Base mode: linear 1x1 classifier (bias-free) over PSP features plus an aux
head on x3 (1024 -> 256 3x3 conv+BN+ReLU -> 1x1 K-way, reference
pspnet.py:64-70).  Fine-tune mode: frozen backbone, separate bias-free
``classifier_n`` producing novel logits concatenated after base logits
(pspnet.py:93-99).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .backbones import get_backbone
from .decoders import PSPModule
from .pop import _torch_conv_init


class PlainPSPNet(nn.Module):
    backbone_name: str = "resnet50"
    n_base: int = 7
    n_novel: int = 0
    is_ft: bool = False
    os: int = 8
    dilated: bool = True
    dtype: Any = jnp.float32
    d_model: int = 512

    def setup(self):
        # os/dilated are resnet-only knobs; forwarding them to other families
        # would TypeError in their constructors (advisor r3)
        bk = (dict(os=self.os, dilated=self.dilated)
              if self.backbone_name.startswith("resnet") else {})
        self.backbone = get_backbone(self.backbone_name, dtype=self.dtype, **bk)
        self.decoder = PSPModule(self.d_model, dtype=self.dtype, name="decoder")
        self.classifier = nn.Conv(1 + self.n_base, (1, 1), use_bias=False,
                                  kernel_init=_torch_conv_init, dtype=self.dtype, name="classifier")
        if self.is_ft:
            self.classifier_n = nn.Conv(self.n_novel, (1, 1), use_bias=False,
                                        kernel_init=_torch_conv_init, dtype=self.dtype, name="classifier_n")
        else:
            self.aux_conv = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                                    kernel_init=_torch_conv_init, dtype=self.dtype, name="aux_conv")
            self.aux_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="aux_bn")
            self.aux_out = nn.Conv(1 + self.n_base, (1, 1), kernel_init=_torch_conv_init,
                                   dtype=self.dtype, name="aux_out")

    def __call__(self, img, train: bool = False):
        if self.is_ft:
            feats = self.backbone(img, train=False)
            feats = self.decoder(feats, train=train)
            out = jnp.concatenate([self.classifier(feats), self.classifier_n(feats)], axis=-1)
            return out.astype(jnp.float32)
        pyramid = self.backbone(img, train=train, return_list=True)
        x4, x3 = pyramid[0], pyramid[1]
        feats = self.decoder(x4, train=train)
        out = self.classifier(feats).astype(jnp.float32)
        if train:
            aux = nn.relu(self.aux_bn(self.aux_conv(x3), use_running_average=not train))
            aux = self.aux_out(aux).astype(jnp.float32)
            return out, aux
        return out
