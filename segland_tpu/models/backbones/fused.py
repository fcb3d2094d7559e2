"""Param-holder modules for fused-kernel paths.

When a block's LN->fc1->gelu->fc2 section runs through the fused Pallas
kernel (ops/pallas_mlp.py), the flax submodules that would normally own the
parameters are never called — these holders create parameters with the
IDENTICAL names, shapes, and initializers (nn.LayerNorm / nn.Dense
defaults), so the parameter tree, converted reference checkpoints
(ckpt/torch_convert.py), and saved training state are byte-compatible
between the fused and unfused paths.
"""

import flax.linen as nn


class LNParams(nn.Module):
    """Same param tree as nn.LayerNorm(name=...): {scale, bias}."""
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class Conv1x1Params(nn.Module):
    """Same param tree as nn.Conv(features, (1,1), name=...): {kernel, bias}."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_features, self.features)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class DenseParams(nn.Module):
    """Same param tree as nn.Dense(name=...): {kernel, bias}."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class ConvParams(nn.Module):
    """Same param tree as nn.Conv(features, kernel_size, name=...):
    {kernel: (kh, kw, in_features // groups, features), bias}.  Used where a
    path (fused kernel or packed-lane reformulation) consumes raw weights."""
    kernel_size: tuple
    in_per_group: int
    features: int

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, self.in_per_group, self.features)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )
