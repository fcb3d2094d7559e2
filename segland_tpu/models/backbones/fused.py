"""Param-holder modules for fused-kernel paths.

When a block's LN->fc1->gelu->fc2 section runs through the fused Pallas
kernel (ops/pallas_mlp.py), the flax submodules that would normally own the
parameters are never called — these holders create parameters with the
IDENTICAL names, shapes, and initializers (nn.LayerNorm / nn.Dense
defaults), so the parameter tree, converted reference checkpoints
(ckpt/torch_convert.py), and saved training state are byte-compatible
between the fused and unfused paths.
"""

import jax.numpy as jnp
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
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, self.in_per_group, self.features))
        if not self.use_bias:
            return kernel, None
        return kernel, self.param("bias", nn.initializers.zeros, (self.features,))


class BNParams(nn.Module):
    """Same variable tree as nn.BatchNorm(name=...): params {scale, bias} +
    batch_stats {mean, var} (fp32).  Lets a reformulation (fused kernel or
    packed-lane path) fold the normalization into a per-channel affine
    without touching the tree.

    ``batch_update=(mean, var)``: train-mode running-stat update mirroring
    nn.BatchNorm(momentum=m): ra = m*ra + (1-m)*batch (requires the caller's
    apply to have batch_stats mutable, exactly like nn.BatchNorm)."""
    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_update=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        if batch_update is not None and not self.is_initializing():
            m = self.momentum
            bm, bv = batch_update
            mean.value = m * mean.value + (1.0 - m) * bm.astype(jnp.float32)
            var.value = m * var.value + (1.0 - m) * bv.astype(jnp.float32)
        return scale, bias, mean.value, var.value
