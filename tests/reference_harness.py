"""Import harness for the PyTorch reference at /root/reference.

Used ONLY by parity tests: runs the reference models to produce golden
activations — nothing is copied from the reference into the framework.

The image lacks cv2/timm/rasterio/torchvision-extras, so minimal stubs are
injected for the import-time dependencies the parity paths never execute.
"""

import sys
import types

import torch
import torch.nn as nn

REFERENCE_PATH = "/root/reference"


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _DropPath(nn.Module):
    """Identity at drop_prob=0 / eval — sufficient for forward parity."""

    def __init__(self, drop_prob=None):
        super().__init__()
        self.drop_prob = drop_prob or 0.0

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * mask.floor_()


def _to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean, std, a, b)


def _vgg16_bn():
    """Hand-built torchvision vgg16_bn-equivalent encoder (cfg "D" with
    BatchNorm): 13 convs + 5 maxpools in one flat ``features`` Sequential
    whose indices match torchvision's exactly, so the reference's slicing
    (``vgg16_bn.features[:5]`` etc., vggunet_pop.py:56-60) and the resulting
    state-dict key numbering are reproduced.  Random-init only — the parity
    tests convert whatever weights come out."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [nn.Conv2d(in_ch, v, kernel_size=3, padding=1),
                       nn.BatchNorm2d(v), nn.ReLU(inplace=True)]
            in_ch = v
    wrapper = nn.Module()
    wrapper.features = nn.Sequential(*layers)
    # torchvision VGG init (vision/torchvision/models/vgg.py)
    for m in wrapper.features.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
            nn.init.constant_(m.bias, 0)
    return wrapper


def install_stubs():
    if "cv2" not in sys.modules:
        _stub_module("cv2")
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.models = _stub_module("torchvision.models")
    if not hasattr(sys.modules["torchvision.models"], "vgg16_bn"):
        sys.modules["torchvision.models"].vgg16_bn = _vgg16_bn
    if "rasterio" not in sys.modules:
        _stub_module("rasterio")
    if "timm" not in sys.modules:
        timm = _stub_module("timm")
        models = _stub_module("timm.models")
        models.__path__ = []  # mark as package so submodule imports resolve
        layers = _stub_module(
            "timm.models.layers",
            DropPath=_DropPath,
            to_2tuple=_to_2tuple,
            trunc_normal_=_trunc_normal_,
        )
        registry = _stub_module("timm.models.registry", register_model=lambda fn: fn)
        timm.models = models
        models.layers = layers
        models.registry = registry


def import_reference():
    install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import networks  # noqa: F401  (reference package)

    return networks
