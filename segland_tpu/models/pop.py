"""GFSSModel — the single, parameterized POP segmentation head.

The reference duplicates an identical GFSS_Model across 8 files
(networks/pspnet_pop.py:37 == convnext_pop.py:30 == swin_pop.py:175 ...);
here it is built once, parameterized by (backbone, decoder, d_model).

Forward modes (reference networks/pspnet_pop.py:123-134):
  * forward_base  — base training / base eval: [bg, base] logits.
  * forward_all   — fine-tuned eval: [bg, base, novel] logits.
  * forward_novel — fine-tune training: forward_all logits plus the novel
    head's sub-logits, used by the caller for pseudo-labeling (the reference
    mutates mask_b in place, pspnet_pop.py:221-231; here pseudo-labeling is a
    pure function in train/ft.py).

The prototype decomposition + classifier run in fp32 via the fused rank-1
collapse (ops/pop.py) regardless of the backbone compute dtype, mirroring
the reference's fp32 autocast island (pspnet_pop.py:95).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .backbones import get_backbone, backbone_filters
from . import decoders as D
from ..ops import pop as pop_ops

# kaiming_uniform(a=sqrt(5)) over fan_in — torch Conv2d default init.
_torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _w3_init(key, shape, dtype=jnp.float32):
    # torch init of the final [1, C] conv kernel: uniform(+-1/sqrt(C))
    import jax

    c = shape[0]
    bound = 1.0 / (c ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Classifier(nn.Module):
    """The shared bias-free 3-layer 1x1 classifier, stored as dense mats
    (w1 [C,C], w2 [C,C], w3 [C]) for the fused POP path."""
    d_model: int

    def setup(self):
        c = self.d_model
        self.w1 = self.param("w1", _torch_conv_init, (c, c))
        self.w2 = self.param("w2", _torch_conv_init, (c, c))
        self.w3 = self.param("w3", _w3_init, (c,))

    def weights(self):
        return (self.w1, self.w2, self.w3)

    def __call__(self, x):
        return pop_ops.classifier_apply(x.astype(jnp.float32), self.w1, self.w2, self.w3)


class GFSSModel(nn.Module):
    backbone_name: str = "resnet50"
    decoder_name: str = "psp"
    n_base: int = 7
    n_novel: int = 0
    is_ft: bool = False
    os: int = 8
    dilated: bool = True
    fused_mlp: bool = False   # Pallas LN+MLP kernel in swin/convnext backbones
    fused_attn: bool = False  # Pallas attention-section kernel in swin backbones
    # Train-mode W-packing override for hrnet/lsknet/vggunet backbones
    # (None = each backbone's measured default; see the BASELINE.md
    # round-2 HRNet and round-4 lsknet/vggunet train-packing A/B tables).
    packed_train: Any = None
    dtype: Any = jnp.float32

    @property
    def d_model(self) -> int:
        filters = backbone_filters(self.backbone_name)
        if self.decoder_name in ("psp", "pspplus"):
            return 512
        if self.decoder_name == "aspp":
            return 256
        if self.decoder_name == "upernetplus":
            return min(filters)  # reference swin_pop.py: get_filters()[0]
        if self.decoder_name in ("fpn_ocr", "simple"):
            return 192
        if self.decoder_name == "hrfpn":
            return sum(filters)  # reference seghr_pop.py:33
        if self.decoder_name == "identity":
            return filters[0]  # vggunet: fused backbone+decoder
        raise ValueError(self.decoder_name)

    @property
    def needs_pyramid(self) -> bool:
        if self.decoder_name in ("psp", "aspp", "identity"):
            return False
        return True

    def setup(self):
        bk = {}
        if self.backbone_name.startswith("resnet"):
            bk = dict(os=self.os, dilated=self.dilated)
        elif self.backbone_name.startswith("hr-") or self.backbone_name in (
                "lsk-t", "vgg16bn-unet"):
            if self.packed_train is not None:
                bk["packed_train"] = self.packed_train
        if self.packed_train is not None and "packed_train" not in bk:
            # fail loudly: an A/B of the knob on resnet/swin/convnext would
            # otherwise be a silent no-op (advisor r3)
            raise ValueError(
                f"packed_train is only supported by hrnet/lsknet/vggunet "
                f"backbones, not {self.backbone_name!r}")
        self.backbone = get_backbone(self.backbone_name, dtype=self.dtype,
                                     fused_mlp=self.fused_mlp,
                                     fused_attn=self.fused_attn, **bk)
        dm = self.d_model
        if self.decoder_name == "identity":
            self.decoder = None
        else:
            cls = D.DECODERS[self.decoder_name]
            if self.decoder_name == "hrfpn":
                kw = {}
            elif self.decoder_name in ("upernetplus", "simple"):
                # fine->coarse channel counts drive the log2 scale heads
                kw = {"out_features": dm, "filters": backbone_filters(self.backbone_name)}
            else:
                kw = {"out_features": dm}
            self.decoder = cls(dtype=self.dtype, name="decoder", **kw)

        self.base_emb = self.param("base_emb", nn.initializers.orthogonal(), (self.n_base, dm))
        self.classifier = Classifier(dm, name="classifier")
        if self.is_ft:
            assert self.n_novel > 0
            self.novel_emb = self.param("novel_emb", nn.initializers.orthogonal(), (self.n_novel, dm))
            self.classifier_n = Classifier(dm, name="classifier_n")

    def extract_features(self, img, train: bool = False):
        """backbone + decoder -> [B,h,w,d_model]."""
        if self.backbone_name.startswith("resnet"):
            feats = self.backbone(img, train=train, return_list=self.needs_pyramid)
            if self.decoder_name == "pspplus":
                # [x4, x2]: reduce is 512-in (see PSPPlusDecoder docstring)
                feats = [feats[0], feats[2]]
        else:
            feats = self.backbone(img, train=train)
        if self.decoder is None:
            return feats.astype(jnp.float32)
        return self.decoder(feats, train=train).astype(jnp.float32)

    def forward_base(self, img, train: bool = False):
        """[B,h,w,1+n_base] logits (+ proto_sim when training)."""
        feats = self.extract_features(img, train)
        logits = pop_ops.pop_logits_base(feats, self.base_emb, *self.classifier.weights())
        if train:
            return logits, pop_ops.proto_similarity(self.base_emb)
        return logits

    def forward_all(self, img, train: bool = False):
        """[B,h,w,1+n_base+n_novel] logits for fine-tuned eval."""
        feats = self.extract_features(img, train)
        logits, _ = pop_ops.pop_logits_all(
            feats, self.base_emb, self.novel_emb,
            self.classifier.weights(), self.classifier_n.weights(),
        )
        return logits

    def forward_novel(self, img, train: bool = True):
        """Fine-tune forward: (full logits, novel-head logits, proto_sim).

        The caller concatenates novel-support and base batches before calling
        (reference pspnet_pop.py:197) and performs pseudo-labeling with the
        returned novel-head logits.  Backbone/decoder BN always runs in
        inference mode here (reference train_mode(), pspnet_pop.py:80-85).
        """
        feats = self.extract_features(img, train=False)
        logits, novel_logits = pop_ops.pop_logits_all(
            feats, self.base_emb, self.novel_emb,
            self.classifier.weights(), self.classifier_n.weights(),
        )
        sim = pop_ops.proto_similarity(self.novel_emb, self.base_emb)
        return logits, novel_logits, sim

    def __call__(self, img, train: bool = False):
        if self.is_ft:
            return self.forward_all(img, train)
        return self.forward_base(img, train)
